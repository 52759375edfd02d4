#!/usr/bin/env python3
"""Independently re-derive the trained matryoshka rotation used by the e08
rerank_trained audit legs: a line-by-line port of graft's jacobiEig +
trainedRotation (Similarity.scala) — same sequential IEEE double ops, same
sweep schedule, same sign fix — run over the gate corpus (sf0.01
embeddings, vec_id order). Every op used (+,-,*,/, sqrt, abs) is exactly
rounded in both CPython and the JVM, so the result is bit-identical to the
engine's rotation while being produced by a different implementation.

Usage: python3 tools/derive_rot.py <sfDir> <m> [--sql]
  --sql prints the DuckDB list_dot_product projection expression for
  embedding in Similarity.scala's oracle (one row per line).
"""
import math
import sys

import duckdb


def jacobi_eig(a0):
    d = len(a0)
    a = [row[:] for row in a0]
    v = [[1.0 if i == j else 0.0 for j in range(d)] for i in range(d)]

    def off():
        s = 0.0
        for i in range(d):
            for j in range(i + 1, d):
                s += a[i][j] * a[i][j]
        return s

    sweep = 0
    while sweep < 64 and off() > 1e-18:
        for p in range(d - 1):
            for q in range(p + 1, d):
                apq = a[p][q]
                if abs(apq) > 1e-300:
                    theta = (a[q][q] - a[p][p]) / (2.0 * apq)
                    if theta >= 0:
                        t = 1.0 / (theta + math.sqrt(theta * theta + 1))
                    else:
                        t = -1.0 / (-theta + math.sqrt(theta * theta + 1))
                    c = 1.0 / math.sqrt(t * t + 1)
                    s = t * c
                    for k in range(d):
                        akp = a[k][p]
                        akq = a[k][q]
                        a[k][p] = c * akp - s * akq
                        a[k][q] = s * akp + c * akq
                        vkp = v[k][p]
                        vkq = v[k][q]
                        v[k][p] = c * vkp - s * vkq
                        v[k][q] = s * vkp + c * vkq
                    for k in range(d):
                        apk = a[p][k]
                        aqk = a[q][k]
                        a[p][k] = c * apk - s * aqk
                        a[q][k] = s * apk + c * aqk
        sweep += 1
    return [a[i][i] for i in range(d)], v


def _dec(x):
    # Spark Cast(double -> decimal(28,10)): shortest-roundtrip string then
    # setScale(10, HALF_UP); CPython repr is the same shortest form
    from decimal import Decimal, ROUND_HALF_UP
    return Decimal(repr(x)).quantize(Decimal("1E-10"),
                                     rounding=ROUND_HALF_UP)


def trained_rotation(sample, m):
    # Mirrors graft's DISTRIBUTED-GRAMIAN definition (Similarity.scala
    # trainedRotation, round 13): first/second moments are per-element
    # decimal(28,10) half-up sums (order-independent, exactly what the
    # engine's hash aggregate computes), cast back to double, then
    # cov_ij := G_ij/n - mean_i*mean_j in doubles.
    d = len(sample[0])
    n = len(sample)
    from decimal import Decimal
    sums = [Decimal(0)] * d
    for r in sample:
        for i in range(d):
            sums[i] += _dec(r[i])
    mean = [float(sums[i]) / n for i in range(d)]
    gram = [[Decimal(0)] * d for _ in range(d)]
    for r in sample:
        for i in range(d):
            xi = r[i]
            row = gram[i]
            for j in range(i, d):
                row[j] += _dec(xi * r[j])
    cov = [[0.0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            c = float(gram[i][j]) / n - mean[i] * mean[j]
            cov[i][j] = c
            cov[j][i] = c
    w, v = jacobi_eig(cov)
    order = sorted(range(d), key=lambda c: (-w[c], c))[:m]
    rows = []
    for c in order:
        row = [v[r][c] for r in range(d)]
        pivot = max(range(d), key=lambda r: (abs(row[r]), -r))
        if row[pivot] < 0:
            row = [-x for x in row]
        rows.append(row)
    return rows


def main():
    sf_dir, m = sys.argv[1], int(sys.argv[2])
    emit_sql = "--sql" in sys.argv[3:]
    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        "WHERE vec_id < 4096 ORDER BY vec_id").fetchall()
    sample = [[float(x) for x in r[0]] for r in rows]
    rot = trained_rotation(sample, m)
    if emit_sql:
        inner = ",\n      |      ".join(
            "list_dot_product(v, [%s])" % ", ".join(repr(x) for x in row)
            for row in rot)
        print("[" + inner + "]")
    else:
        for row in rot:
            print(" ".join(repr(x) for x in row))


if __name__ == "__main__":
    main()
