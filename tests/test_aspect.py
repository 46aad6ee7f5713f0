"""Aspect chi-square bootstrapping vs an independent pure-Python
replica (same annotate/argmax-tie, DF stats, chi scan, bounded
expansion semantics)."""

from __future__ import annotations

import numpy as np

from ir_base_spark.ops.aspect import aspect_bootstrap


def _chi(n, df, a, cdf):
    if df <= 0 or cdf <= 0 or df >= n or cdf >= n:
        return 0.0
    b = df - a
    c = cdf - a
    d = n - df - cdf + a
    return n * (a * d - b * c) * (a * d - b * c) / cdf / (b + d) / df / (c + d)


def _replica(doc_terms, seeds, K, chi_size, chi_ratio, iterations):
    kw = {k: set(ts) for k, ts in seeds.items()}

    def annotate():
        out = {}
        for d, terms in doc_terms.items():
            counts = [len(terms & kw[k]) for k in range(K)]
            sel, mx = -1, 0
            for k, c in enumerate(counts):
                if c > mx:
                    sel, mx = k, c
                elif c == mx:
                    sel = -1
            if sel >= 0:
                out[d] = sel
        return out

    for _ in range(iterations):
        asg = annotate()
        n = len(asg)
        dist = [sum(1 for a in asg.values() if a == k) for k in range(K)]
        wstat: dict[str, list[int]] = {}
        for d, a in asg.items():
            for t in doc_terms[d]:
                wstat.setdefault(t, [0] * K)[a] += 1
        cands: dict[int, list[tuple[float, str]]] = {k: [] for k in range(K)}
        for t, arr in wstat.items():
            df = sum(arr)
            sid, mxc = -1, 0.0
            for k in range(K):
                chi = _chi(n, df, arr[k], dist[k])
                if chi > chi_ratio * mxc:
                    sid, mxc = k, chi
            if sid >= 0:
                cands[sid].append((mxc, t))
        for k in range(K):
            top = sorted(cands[k], key=lambda x: (-x[0], x[1]))[:chi_size]
            kw[k] |= {t for _c, t in top}
    return kw, annotate()


def test_aspect_bootstrap_matches_replica(spark):
    rng = np.random.default_rng(3)
    vocab = [f"w{j}" for j in range(30)]
    doc_terms = {}
    rows = []
    for d in range(60):
        ts = set(
            vocab[int(j)] for j in rng.choice(30, size=int(rng.integers(3, 9)), replace=False)
        )
        doc_terms[d] = ts
        rows += [(d, t) for t in ts]
    seeds = {0: {"w0", "w1"}, 1: {"w5", "w6"}, 2: {"w10", "w11"}}
    seed_rows = [(k, t) for k, ts in seeds.items() for t in sorted(ts)]

    df = spark.createDataFrame(rows, "doc_id long, term string")
    sdf = spark.createDataFrame(seed_rows, "aspect_id int, term string")
    kw_df, asg_df = aspect_bootstrap(
        df, sdf, n_aspects=3, chi_size=3, chi_ratio=1.0, iterations=2
    )
    want_kw, want_asg = _replica(doc_terms, seeds, 3, 3, 1.0, 2)

    got_kw: dict[int, set] = {}
    for r in kw_df.collect():
        got_kw.setdefault(r["aspect_id"], set()).add(r["term"])
    assert got_kw == {k: v for k, v in want_kw.items() if v}

    got_asg = {r["doc_id"]: r["aspect_id"] for r in asg_df.collect()}
    assert got_asg == want_asg
