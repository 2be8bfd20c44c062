#!/usr/bin/env python3
"""Deterministic replicated corpus for the max_year_temp throughput
head-to-head: N lines, each one chunk in the reference's own format (a
JSON array of [yyyymm, temp] tuples, map_libs/temperature.json) — no RNG,
so both pipelines see byte-identical input on every run.
Usage: gen_temp_corpus.py <out> <n_lines> [tuples_per_line=100]
"""
import json, sys

out, n = sys.argv[1], int(sys.argv[2])
tpl = int(sys.argv[3]) if len(sys.argv) > 3 else 100
with open(out, "w") as f:
    for i in range(n):
        tups = []
        for j in range(tpl):
            x = (i * tpl + j) * 2654435761 % 2**32
            year = 1900 + (x % 126)            # 1900..2025
            month = 1 + (x // 126) % 12
            temp = round(((x // 1512) % 1000) / 10.0 - 20.0, 1)  # -20.0..79.9
            tups.append([year * 100 + month, temp])
        f.write(json.dumps(tups) + "\n")
