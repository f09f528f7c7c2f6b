#!/usr/bin/env python3
"""Rewrite `round(EXPR, k)` inside SQL strings of the query .scala files into
the cross-engine floor form used by graft.queries.Q.rnd:

    floor((EXPR + EPS_k) * 10^k + 0.5) / 10^k      EPS_k = 1.37e-2 / 10^k

Both Spark SQL and DuckDB evaluate that with identical IEEE semantics, unlike
their builtin round()s (Spark: BigDecimal-on-string; DuckDB: raw double).
Run on demand when adding new oracle SQL with round(); idempotent on already
converted text (no `round(` left afterwards).
"""
import re
import sys

EPS = {2: "1.37e-4", 3: "1.37e-5", 4: "1.37e-6", 6: "1.37e-8"}
POW = {2: "100", 3: "1000", 4: "10000", 6: "1000000"}


def convert(text: str) -> str:
    out = []
    i = 0
    while True:
        m = re.search(r"\bround\(", text[i:])
        if not m:
            out.append(text[i:])
            break
        start = i + m.start()
        out.append(text[i:start])
        j = start + len("round(")
        depth = 1
        while depth > 0:
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
            j += 1
        inner = text[start + len("round("):j - 1]
        km = re.match(r"^(.*),\s*(\d)$", inner, re.S)
        if not km:
            # not a 2-arg round (shouldn't happen) — leave untouched
            out.append(text[start:j])
            i = j
            continue
        expr, k = km.group(1).strip(), int(km.group(2))
        out.append(f"floor(({expr} + {EPS[k]}) * {POW[k]} + 0.5) / {POW[k]}")
        i = j
    return "".join(out)


if __name__ == "__main__":
    for path in sys.argv[1:]:
        src = open(path).read()
        dst = convert(src)
        if dst != src:
            open(path, "w").write(dst)
            print(f"converted {path}")
