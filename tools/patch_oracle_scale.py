#!/usr/bin/env python3
"""Re-target the trained-constant oracles to another corpus scale.

The committed oracle SQL for e07/e08/e09/t05 embeds GATE-corpus (sf0.01)
snapshots: the k=8 IVF k-means book, the adaptiveK dedup book (k=8 at the
gate, where both coincide), and the m=16/24/32 PCA rotations. For an
oracle run at another scale those constants must be re-derived for THAT
corpus — same training replicas (tools/derive_kmeans.py /
tools/derive_rot.py), bigger input. This tool loads a Verify dump's
oracle_sql.json, re-derives every trained constant for the target corpus,
and substitutes them block by block:

  e07, t05 : the k=8 VALUES block
  e09      : the adaptiveK(n) VALUES block
  e08      : `cents` block -> k=8, `dcents` block -> adaptiveK(n),
             the three [list_dot_product...] rotation projections

Usage:
  python3 tools/patch_oracle_scale.py <sfDir> <verifyOutDir> [outJson]
Writes <verifyOutDir>/oracle_sql_patched.json by default; run the checker
against it with: check_oracle.py (point it at a dir containing the
patched file renamed to oracle_sql.json, or pass outJson accordingly).
"""
import json
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import derive_kmeans
import derive_rot

import duckdb


def kmeans_rows(sf_dir, k, iters=3):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(embedding AS DOUBLE[]) FROM "
        f"'{sf_dir}/embeddings.parquet' ORDER BY vec_id").fetchall()
    n = len(rows)
    cap = min(n, max(4096, 8 * k))
    vs = [r[0] for r in rows[:cap]]
    cents = derive_kmeans.train(vs, k, iters)
    return "\n".join(
        f"  ({c}, [" + ", ".join(derive_kmeans.fmt(x) for x in cent) + "])"
        + ("," if c < len(cents) - 1 else "")
        for c, cent in enumerate(cents)), n


def rot_sql(sf_dir, m):
    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        "WHERE vec_id < 4096 ORDER BY vec_id").fetchall()
    sample = [[float(x) for x in r[0]] for r in rows]
    rot = derive_rot.trained_rotation(sample, m)
    # stripMargin form as it appears in the final SQL text
    return "[" + ",\n      ".join(
        "list_dot_product(v, [%s])" % ", ".join(repr(x) for x in row)
        for row in rot) + "]"


class JavaRandom:
    """java.util.Random LCG — what scala.util.Random(seed) wraps."""
    M48 = (1 << 48) - 1

    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & self.M48

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & self.M48
        return self.seed >> (48 - bits)

    def next_int(self, bound):
        if bound & (bound - 1) == 0:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < (1 << 31):
                return val


def scala_shuffle(xs, rnd):
    """scala.util.Random.shuffle: Fisher-Yates from the tail."""
    buf = list(xs)
    for n in range(len(buf), 1, -1):
        k = rnd.next_int(n)
        buf[n - 1], buf[k] = buf[k], buf[n - 1]
    return buf


def simhash_masks(bits, tables=8, seed=20260815):
    """Mirror of Dedup.simhashPerms + the d26 prefix-mask fold — one RNG
    stream across tables, top-`bits` positions of each permutation."""
    rnd = JavaRandom(seed)
    perms = [scala_shuffle(range(64), rnd) for _ in range(tables)]
    return [sum(1 << p[j] for j in range(bits)) for p in perms]


def simhash_cond(bits):
    return "(" + " OR ".join(
        f"(x & ({m})) = 0" for m in simhash_masks(bits)) + ")"


def adaptive_prefix_bits(n_docs):
    import math
    return min(28, max(4, math.ceil(math.log2(n_docs / 128.0))))


CENTS = re.compile(
    r"(?<![a-z])cents AS \(SELECT \* FROM \(VALUES\n.*?\n\) "
    r"t\(cluster, centroid\)\)", re.S)
DCENTS = re.compile(
    r"dcents AS \(SELECT \* FROM \(VALUES\n.*?\n\) "
    r"t\(cluster, centroid\)\)", re.S)


def sub_block(sql, pat, rows, name):
    def repl(m):
        head = m.group(0).split("VALUES\n", 1)[0] + "VALUES\n"
        return head + rows + "\n) t(cluster, centroid))"
    out, cnt = pat.subn(repl, sql, count=1)
    assert cnt == 1, f"{name}: snapshot block not found"
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 \
        else f"{out_dir}/oracle_sql_patched.json"
    gate = "/root/testdata/sf0.01"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    k8_rows, n = kmeans_rows(sf_dir, 8)
    kd = max(8, n // 256)
    kd_rows, _ = kmeans_rows(sf_dir, kd)
    print(f"target corpus n={n}, adaptiveK={kd}")

    # d26: the oracle's candidate condition embeds the top-`prefixBits`
    # masks of the seed-fixed permutations; the engine adapts prefixBits
    # to the corpus (n/128 occupancy), the committed SQL hardcodes the
    # gate's 4. Re-derive the masks (validated below against the gate
    # SQL's own constants) at the target corpus's adaptive width.
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'").fetchone()[0]
    gate_cond = simhash_cond(4)
    d26 = oracle["d26_simhash_permuted"]
    assert d26.count(gate_cond) == 1, \
        "d26: gate prefix-mask condition not found (RNG replica drifted?)"
    tgt_bits = adaptive_prefix_bits(n_docs)
    oracle["d26_simhash_permuted"] = d26.replace(
        gate_cond, simhash_cond(tgt_bits))
    print(f"d26 prefixBits {4} -> {tgt_bits} (n_docs={n_docs})")

    for q in ("e07_ann_ivf_kmeans", "t05_hybrid_ivf"):
        oracle[q] = sub_block(oracle[q], CENTS, k8_rows, q)
    oracle["e09_semantic_dedup"] = sub_block(
        oracle["e09_semantic_dedup"], CENTS, kd_rows, "e09")

    e08 = oracle["e08_ann_recall"]
    e08 = sub_block(e08, DCENTS, kd_rows, "e08/dcents")
    e08 = sub_block(e08, CENTS, k8_rows, "e08/cents")
    for m in (32, 24, 16):  # longest first: 16 is a textual near-prefix
        old = rot_sql(gate, m)
        new = rot_sql(sf_dir, m)
        assert e08.count(old) == 1, f"e08 rot{m}: gate projection not found"
        e08 = e08.replace(old, new)
    oracle["e08_ann_recall"] = e08

    json.dump(oracle, open(out_json, "w"))
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
