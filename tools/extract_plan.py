#!/usr/bin/env python3
"""Extract one query's formatted plan from a PLANS.md file.
Usage: extract_plan.py <plans.md or -> <query> [out]"""
import sys

def extract(text, query):
    lines = text.splitlines()
    out, on = [], False
    for ln in lines:
        if ln.startswith("## "):
            if on:
                break
            on = ln.strip() == f"## {query}"
            continue
        if on:
            out.append(ln)
    return "\n".join(out).strip("\n`\n").strip() + "\n"

if __name__ == "__main__":
    src, q = sys.argv[1], sys.argv[2]
    text = sys.stdin.read() if src == "-" else open(src).read()
    body = extract(text, q)
    if len(sys.argv) > 3:
        open(sys.argv[3], "w").write(body)
    else:
        print(body)
