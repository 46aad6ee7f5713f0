"""LDA by variational inference — distributed, deterministic.

Spark analog of the reference's variational LDA
(/root/reference/src/topicmodels/LDA/LDA_Variational.java:21,
106-199; Blei/Ng/Jordan 2003):

    inner (per doc, per sparse term): phi_djk ∝ exp(logφ_kj + ψ(γ_dk))
                                      γ_dk = α_k + Σ_j φ_djk · tf_dj
    M-step: logφ_kj = log( ((β-1) + Σ_d tf·phi_djk) / Σ_j ·)
            α by the reference's damped Newton step (stepsize 0.001,
            calculate_M_step :158-192) on the digamma sufficient
            statistics Σ_d (ψ(γ_dk) − ψ(Σ_k γ_dk)).

ψ/ψ' are the reference's own Abramowitz & Stegun polynomials
(functions/scalar.digamma/trigamma — codegen column exprs; the same
from-spec polynomials are transcribed here in Python for the driver-
side K-dimensional Newton loop, and emitted textually by the SQL
oracle, so all three agree bit-for-bit on identical inputs).

Deviations, documented: Math.random in the φ/γ seeding
(_Doc.setTopics4Variational + Utils.randomize :405-415) is replaced
by the seeded md5-hash uniform (same offset-alpha, L1-normalized
shape); every convergence test (inner variational loop, EM loop,
alpha-Newton loop) becomes a FIXED iteration count so the oracle can
unroll; the likelihood computation (only used for those tests and
reporting) is omitted.

Scale shape: state is γ (doc-sized, lives partitioned by doc next to
the postings), logφ (vocab × K, broadcast) and α (K driver floats —
the Newton statistics are ONE K-column aggregate row collected per
EM iteration, the same bounded-scalar pattern as the LambdaRank
trainers). Each inner variational round is one postings-vs-γ join +
one per-doc aggregation; all expressions are per-k codegen columns —
no UDFs, nothing corpus-sized ever collects. For many EM iterations,
checkpoint γ periodically to truncate lineage.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import digamma as _dg_col


def py_digamma(x: float) -> float:
    """Driver-side transcription of Utils.digamma (:734-742) — must
    stay formula-identical to functions.scalar.digamma."""
    x = x + 6.0
    p = 1.0 / (x * x)
    p = (
        ((0.004166666666667 * p - 0.003968253986254) * p + 0.008333333333333)
        * p
        - 0.083333333333333
    ) * p
    return (
        p + math.log(x) - 0.5 / x - 1.0 / (x - 1.0) - 1.0 / (x - 2.0)
        - 1.0 / (x - 3.0) - 1.0 / (x - 4.0) - 1.0 / (x - 5.0)
        - 1.0 / (x - 6.0)
    )


def py_trigamma(x: float) -> float:
    """Driver-side transcription of Utils.trigamma (:713-726)."""
    x = x + 6.0
    p = 1.0 / (x * x)
    p = (
        (
            (
                ((0.075757575757576 * p - 0.033333333333333) * p
                 + 0.0238095238095238) * p
                - 0.033333333333333
            ) * p
            + 0.166666666666667
        ) * p
        + 1.0
    ) / x + 0.5 * p
    for _ in range(6):
        x = x - 1.0
        p = 1.0 / (x * x) + p
    return p


def newton_alpha(
    alpha: list[float], stat: list[float], n_docs: int,
    steps: int, stepsize: float = 0.001,
) -> list[float]:
    """The reference's damped Newton update for α
    (calculate_M_step :168-191), fixed ``steps`` iterations."""
    K = len(alpha)
    a = list(alpha)
    for _ in range(steps):
        asum = sum(a)
        di_asum = py_digamma(asum)
        z = n_docs * py_trigamma(asum)
        g = [0.0] * K
        h = [0.0] * K
        c1 = c2 = 0.0
        for k in range(K):
            g[k] = n_docs * (di_asum - py_digamma(a[k])) + stat[k]
            h[k] = -n_docs * py_trigamma(a[k])
            c1 += g[k] / h[k]
            c2 += 1.0 / h[k]
        c = c1 / (1.0 / z + c2)
        for k in range(K):
            a[k] = a[k] - stepsize * (g[k] - c) / h[k]
    return a


def _h01(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )


def lda_variational_train(
    postings: DataFrame,
    n_topics: int = 3,
    alpha0: float = 1.0,
    beta: float = 1.5,
    em_iters: int = 2,
    var_iters: int = 2,
    newton_steps: int = 2,
    doc_col: str = "doc_id",
    term_col: str = "term",
    tf_col: str = "tf",
) -> tuple[DataFrame, DataFrame, list[float]]:
    """postings(doc, term, tf) → (gamma, log_phi, alpha).

    gamma: (doc_col, g_0..g_{K-1}) — variational Dirichlet params;
    log_phi: (term_col, lp_0..lp_{K-1}) — log P(w|z);
    alpha: the K estimated Dirichlet hyperparameters.
    """
    K = n_topics
    ks = range(K)
    P = postings.select(
        F.col(doc_col).alias("d"),
        F.col(term_col).alias("w"),
        F.col(tf_col).cast("double").alias("v"),
    ).cache()
    spark = P.sparkSession

    def m_logphi(sstat):
        """sstat(w, s_0..s_{K-1}) → broadcastable (w, lp_k) in log."""
        tot = sstat.agg(*[F.sum(f"s{k}").alias(f"t{k}") for k in ks])
        return sstat.crossJoin(F.broadcast(tot)).select(
            "w",
            *[
                F.log(F.col(f"s{k}") / F.col(f"t{k}")).alias(f"lp{k}")
                for k in ks
            ],
        )

    def alpha_stats(gamma, alpha):
        """Collect (docSize, Σ_d ψ(γ_k) − ψ(Σγ)) and run the Newton."""
        gsum = F.col("g0")
        for k in range(1, K):
            gsum = gsum + F.col(f"g{k}")
        row = gamma.select(
            *[
                (_dg_col(F.col(f"g{k}")) - _dg_col(gsum)).alias(f"a{k}")
                for k in ks
            ]
        ).agg(
            F.count(F.lit(1)).alias("D"),
            *[F.sum(f"a{k}").alias(f"st{k}") for k in ks],
        ).collect()[0]
        return newton_alpha(
            alpha, [row[f"st{k}"] for k in ks], int(row["D"]), newton_steps
        )

    # --- init (initialize_probability): seeded randomize analog ---
    phi0 = P.select(
        "d", "w", "v",
        *[
            (
                F.lit(alpha0)
                + _h01(
                    F.concat(
                        F.col("d").cast("string"), F.lit("#"), F.col("w"),
                        F.lit(f"#{k}"),
                    )
                )
            ).alias(f"r{k}")
            for k in ks
        ],
    )
    rsum = F.col("r0")
    for k in range(1, K):
        rsum = rsum + F.col(f"r{k}")
    phi0 = phi0.select(
        "d", "w", "v",
        *[(F.col(f"r{k}") / rsum).alias(f"p{k}") for k in ks],
    )

    def gamma_from_phi(phi, alpha):
        return phi.groupBy("d").agg(
            *[
                (F.lit(alpha[k]) + F.sum(F.col(f"p{k}") * F.col("v"))).alias(
                    f"g{k}"
                )
                for k in ks
            ]
        )

    def sstat_from_phi(phi):
        return phi.groupBy("w").agg(
            *[
                (
                    F.lit(beta - 1.0) + F.sum(F.col(f"p{k}") * F.col("v"))
                ).alias(f"s{k}")
                for k in ks
            ]
        )

    alpha = [alpha0] * K
    gamma = gamma_from_phi(phi0, alpha).cache()
    logphi = m_logphi(sstat_from_phi(phi0)).cache()
    alpha = alpha_stats(gamma, alpha)

    # --- EM iterations ---
    prev_phi = None
    for _ in range(em_iters):
        phi = None
        for _t in range(var_iters):
            j = P.join(gamma, "d").join(F.broadcast(logphi), "w")
            xs = [
                (F.col(f"lp{k}") + _dg_col(F.col(f"g{k}"))).alias(f"x{k}")
                for k in ks
            ]
            j = j.select("d", "w", "v", *xs)
            m = F.greatest(*[F.col(f"x{k}") for k in ks]) if K > 1 else F.col("x0")
            esum = F.exp(F.col("x0") - m)
            for k in range(1, K):
                esum = esum + F.exp(F.col(f"x{k}") - m)
            ls = m + F.log(esum)
            phi = j.select(
                "d", "w", "v",
                *[(F.exp(F.col(f"x{k}") - ls)).alias(f"p{k}") for k in ks],
            )
            if _t == var_iters - 1:
                # the E-step output feeds BOTH the γ checkpoint and the
                # M-step φ aggregation: cache it so the variational
                # chain executes once per EM iteration, not once per
                # consumer (the chain re-ran ~2x per iteration before)
                phi = phi.cache()
            gamma = gamma_from_phi(phi, alpha)
        # ONE heavy job per EM iteration: the checkpoint materializes
        # the cached E-step φ (and, lazily riding along, the PREVIOUS
        # iteration's logφ, which this iteration's chain reads) — the
        # M-step logφ below is NOT forced here, so the final
        # iteration's logφ is never computed unless a caller asks for
        # it (γ-only consumers skip a whole vocab aggregation).
        gamma = gamma.localCheckpoint()
        if prev_phi is not None:
            prev_phi.unpersist(blocking=False)
        prev_logphi = logphi
        logphi = m_logphi(sstat_from_phi(phi)).cache()
        prev_logphi.unpersist(blocking=False)
        prev_phi = phi
        alpha = alpha_stats(gamma, alpha)

    gamma_out = gamma.select(
        F.col("d").alias(doc_col), *[F.col(f"g{k}").alias(f"g_{k}") for k in ks]
    )
    logphi_out = logphi.select(
        F.col("w").alias(term_col),
        *[F.col(f"lp{k}").alias(f"lp_{k}") for k in ks],
    )
    return gamma_out, logphi_out, alpha
