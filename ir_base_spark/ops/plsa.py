"""pLSA topic model with a background language model — distributed EM.

Deterministic Spark analog of the reference's pLSA
(/root/reference/src/topicmodels/pLSA/pLSA.java:155-216,
twoTopic.java background mixture): documents are mixtures of K topics
plus a corpus-wide background distribution, fit by EM:

    E:  s_dj    = Σ_k θ_dk φ_kj                     (mixture likelihood)
        propB_j = λ·B_j / (λ·B_j + (1-λ)·s_dj)       (background posterior)
        exp_djk = tf_dj · (1-propB_j) · θ_dk φ_kj / s_dj
    M:  θ_dk ∝ (α-1) + Σ_j exp_djk                   (per-doc normalize)
        φ_kj ∝ (β-1) + Σ_d exp_djk                   (per-topic normalize)

B_j is the L1-normalized (β-1)+TTF background (initialize_probability,
pLSA.java:115-129). Deviations from the reference, for determinism and
distribution:

- Math.random() init (setTopics / Utils.randomize) is replaced by a
  seeded md5-hash init: u(x,k) = int(md5(x#k)[0:8 hex])/2^32 — the same
  symmetry-breaking role, identically computable by the SQL oracle.
- Fixed iteration count instead of the likelihood-delta convergence
  test (TopicModel.EM): pinned work, bit-reproducible output.
- Sums associate left-to-right in the written k-order on both engines;
  cross-row float sums (the aggregations) are order-free at oracle
  tolerance (outputs round to 6 dp).

Scale shape: one EM iteration is ONE join of the postings against the
doc-topic table (shuffle keyed by doc — co-partition postings and θ by
doc at cluster scale) plus a BROADCAST of the (vocab × K) topic-term
table, then two aggregations (by doc, by term). All expressions are
per-k COLUMNS (K is small), fully codegen — no UDFs, no explosion of
postings by K. θ is the only doc-sized state; at 10^12 turns it lives
partitioned next to the postings and each iteration is a co-located
join. For many iterations, checkpoint θ/φ periodically to truncate
lineage (the caller loop is the natural place).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h01(col):
    """Deterministic hash-uniform in [0,1): first 8 md5 hex digits /
    2^32 — portable to the SQL oracle verbatim."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )


def plsa_train(
    postings: DataFrame,
    n_topics: int = 3,
    alpha: float = 2.0,
    beta: float = 1.5,
    lam: float = 0.3,
    iterations: int = 2,
    doc_col: str = "doc_id",
    term_col: str = "term",
    tf_col: str = "tf",
) -> tuple[DataFrame, DataFrame]:
    """postings(doc, term, tf) → (theta, phi).

    theta: (doc_col, t_0..t_{K-1}) — P(z|d) rows summing to 1.
    phi:   (term_col, p_0..p_{K-1}, bg) — P(w|z) columns each summing
    to 1 over the vocabulary, plus the background P(w|θ_B).
    """
    K = n_topics
    P = postings.select(
        F.col(doc_col).alias("d"),
        F.col(term_col).alias("w"),
        F.col(tf_col).cast("double").alias("v"),
    ).cache()  # read by docs/vocab/init and once per EM iteration
    docs = P.select("d").distinct()
    vocab = P.groupBy("w").agg(F.sum("v").alias("wtf")).cache()

    # background: L1-normalized (beta-1)+TTF (pLSA.java:115-120)
    bg_raw = F.lit(beta - 1.0) + F.col("wtf")
    bg_tot = vocab.agg(F.sum(bg_raw).alias("_bgtot"))
    bg = vocab.crossJoin(F.broadcast(bg_tot)).select(
        "w", (bg_raw / F.col("_bgtot")).alias("bg")
    )

    def _norm_rows(df, key, prefix, out_prefix):
        s = F.col(f"{prefix}0")
        for k in range(1, K):
            s = s + F.col(f"{prefix}{k}")
        return df.select(
            key,
            *[
                (F.col(f"{prefix}{k}") / s).alias(f"{out_prefix}{k}")
                for k in range(K)
            ],
        )

    # seeded init (replaces Math.random; see module docstring)
    theta = _norm_rows(
        docs.select(
            "d",
            *[
                (
                    F.lit(alpha - 1.0)
                    + _h01(F.concat(F.col("d").cast("string"), F.lit(f"#t{k}")))
                ).alias(f"ts{k}")
                for k in range(K)
            ],
        ),
        "d", "ts", "t",
    )

    def _norm_phi(sstat):
        """phi_kj = sstat_kj / Σ_j sstat_kj, background re-attached.

        sstat is read twice (the normalizer row and the per-term
        select): cached so the topic-term aggregation runs once."""
        sstat = sstat.cache()
        tot = sstat.agg(
            *[F.sum(f"ws{k}").alias(f"_wt{k}") for k in range(K)]
        )
        return (
            sstat.crossJoin(F.broadcast(tot))
            .select(
                "w",
                *[
                    (F.col(f"ws{k}") / F.col(f"_wt{k}")).alias(f"p{k}")
                    for k in range(K)
                ],
            )
            .join(F.broadcast(bg), "w")
        )

    phi = _norm_phi(
        vocab.select(
            "w",
            *[
                (
                    F.lit(beta - 1.0)
                    + _h01(F.concat(F.col("w"), F.lit(f"#p{k}")))
                ).alias(f"ws{k}")
                for k in range(K)
            ],
        )
    )

    for _ in range(iterations):
        j = P.join(theta, "d").join(F.broadcast(phi), "w")
        s = F.col("t0") * F.col("p0")
        for k in range(1, K):
            s = s + F.col(f"t{k}") * F.col(f"p{k}")
        prop_b = (F.lit(lam) * F.col("bg")) / (
            F.lit(lam) * F.col("bg") + F.lit(1.0 - lam) * s
        )
        e = j.select(
            "d",
            "w",
            *[
                (
                    F.col("v")
                    * (F.lit(1.0) - prop_b)
                    * F.col(f"t{k}")
                    * F.col(f"p{k}")
                    / s
                ).alias(f"e{k}")
                for k in range(K)
            ],
        ).cache()  # E-step output feeds BOTH the θ and φ aggregations
        theta = _norm_rows(
            e.groupBy("d").agg(
                *[
                    (F.lit(alpha - 1.0) + F.sum(f"e{k}")).alias(f"ts{k}")
                    for k in range(K)
                ]
            ),
            "d", "ts", "t",
        )
        phi = _norm_phi(
            e.groupBy("w").agg(
                *[
                    (F.lit(beta - 1.0) + F.sum(f"e{k}")).alias(f"ws{k}")
                    for k in range(K)
                ]
            )
        )

    theta_out = theta.select(
        F.col("d").alias(doc_col),
        *[F.col(f"t{k}").alias(f"t_{k}") for k in range(K)],
    )
    phi_out = phi.select(
        F.col("w").alias(term_col),
        *[F.col(f"p{k}").alias(f"p_{k}") for k in range(K)],
        "bg",
    )
    return theta_out, phi_out
