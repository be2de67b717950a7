"""Distributed GLM training via sufficient statistics — logistic
(logit link) and Poisson (log link) Newton/IRLS where the corpus is
touched ONCE.

The scale insight: a single-feature GLM needs only the per-distinct-x
counts (x, n, s=Σy) — for a bounded integer feature (discount basis
points: 11 values) that is an 11-row table, so the corpus prices
exactly one partial-aggregatable GROUP BY and every Newton step runs
on the tiny sufficient-statistic frame.  At 100 TB the iteration cost
is independent of corpus size — the same reason `lloyds_centroids`
iterates over k×dim numbers, not vectors.  Families differ only in
the per-row mean/weight expressions; adding one is a ~30-line pair of
functions (see the logistic/Poisson pairs below).

Determinism contract (the k-means discipline): β is quantized to
``round_dp`` decimals IN SQL at the end of every step before the
driver bakes it into the next step's expressions, so the DuckDB
oracle replaying the identical CTE chain sees bit-identical inputs;
per-step probabilities are 9-dp-quantized before the weighted sums
(the ln/exp fence used by the PSI/KL queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Quantization applied to p inside every step and to β between steps.
P_DP = 9
BETA_DP = 9


def _finite_beta(row, which: str) -> tuple[float, float]:
    """Validate one collected Newton step — degenerate sufficient
    statistics (a single distinct x, or a saturated fit whose 9-dp
    p hits exactly 0/1 so w and the information determinant are 0)
    make the 2×2 solve divide by zero; fail LOUDLY instead of baking
    NaN/Inf βs into query output (ADVICE r6)."""
    import math

    b0 = row["b0"]
    b1 = row["b1"]
    if (
        b0 is None
        or b1 is None
        or not math.isfinite(float(b0))
        or not math.isfinite(float(b1))
    ):
        raise ValueError(
            f"{which} Newton step degenerate (singular information "
            f"matrix or saturated fit): beta=({b0}, {b1}); the "
            "sufficient statistics need >=2 distinct x values with "
            "non-degenerate response rates"
        )
    return float(b0), float(b1)


def _step_exprs(b0: float, b1: float) -> list[F.Column]:
    """One Newton step's five sufficient sums over the (x, n, s) frame,
    with the current β baked as literals.  p and w are quantized before
    the sums so both engines aggregate identical decimals."""
    eta = F.lit(float(b0)) + F.lit(float(b1)) * F.col("x")
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)), P_DP)
    w = F.round(p * (F.lit(1.0) - p), P_DP)
    resid = F.col("s") - F.col("n") * p
    return [
        F.sum(resid).alias("u0"),
        F.sum(F.col("x") * resid).alias("u1"),
        F.sum(F.col("n") * w).alias("i00"),
        F.sum(F.col("n") * F.col("x") * w).alias("i01"),
        F.sum(F.col("n") * F.col("x") * F.col("x") * w).alias("i11"),
    ]


def logistic_newton(suff: DataFrame, n_iter: int = 3) -> tuple[float, float]:
    """Fit (intercept, slope) by ``n_iter`` Newton steps over a
    sufficient-statistic frame with integer columns (x, n, s).

    The frame is persisted for the loop (it is aggregate-sized — one
    row per distinct feature value); each step is one 5-cell aggregate
    whose solved 2×2 update is rounded to ``BETA_DP`` IN SQL before the
    single-row collect, so only quantized decimals ever reach Python.
    """
    suff = suff.persist()
    try:
        b0, b1 = 0.0, 0.0
        for _ in range(n_iter):
            sums = suff.agg(*_step_exprs(b0, b1))
            det = F.col("i00") * F.col("i11") - F.col("i01") * F.col("i01")
            # try_divide: a singular information matrix (det == 0)
            # yields NULL instead of an ANSI divide-by-zero, and
            # _finite_beta turns it into a clear ValueError; on a
            # non-zero det the quotient is bit-identical to `/`.
            row = sums.select(
                F.round(
                    F.lit(b0)
                    + F.try_divide(
                        F.col("i11") * F.col("u0") - F.col("i01") * F.col("u1"),
                        det,
                    ),
                    BETA_DP,
                ).alias("b0"),
                F.round(
                    F.lit(b1)
                    + F.try_divide(
                        F.col("i00") * F.col("u1") - F.col("i01") * F.col("u0"),
                        det,
                    ),
                    BETA_DP,
                ).alias("b1"),
            ).collect()[0]
            b0, b1 = _finite_beta(row, "logistic")
        return b0, b1
    finally:
        suff.unpersist()


def newton_step_sql(prev_cte: str, suff_cte: str) -> str:
    """The DuckDB replay of one Newton step: a one-row SELECT computing
    the updated (b0, b1) from ``suff_cte`` CROSS JOINed with the
    previous step's one-row β CTE — textually the same tree
    :func:`_step_exprs` builds (with β read from ``prev_cte`` instead
    of baked literals, which the between-step BETA_DP quantization
    makes bit-identical), so the oracle iterates exactly."""
    return f"""
  SELECT round(m.b0 + (m.i11 * m.u0 - m.i01 * m.u1)
               / (m.i00 * m.i11 - m.i01 * m.i01), {BETA_DP}) AS b0,
         round(m.b1 + (m.i00 * m.u1 - m.i01 * m.u0)
               / (m.i00 * m.i11 - m.i01 * m.i01), {BETA_DP}) AS b1
  FROM (
    SELECT any_value(b0) AS b0, any_value(b1) AS b1,
           SUM(s - n * p) AS u0,
           SUM(x * (s - n * p)) AS u1,
           SUM(n * w) AS i00,
           SUM(n * x * w) AS i01,
           SUM(n * x * x * w) AS i11
    FROM (
      SELECT b0, b1, x, n, s, p, round(p * (1.0 - p), {P_DP}) AS w
      FROM (
        SELECT prev.b0, prev.b1, t.x, t.n, t.s,
               round(1.0 / (1.0 + exp(-(prev.b0 + prev.b1 * t.x))),
                     {P_DP}) AS p
        FROM {suff_cte} t CROSS JOIN {prev_cte} prev
      )
    )
  ) m
"""


def _poisson_step_exprs(b0: float, b1: float) -> list[F.Column]:
    """One Newton step's sums for the log-link Poisson family: the
    canonical-link score is Σ(y − n·λ)·[1,x] with information
    Σ n·λ·[1,x][1,x]ᵀ, λ = exp(b0 + b1·x) quantized like p in the
    logistic step."""
    lam = F.round(F.exp(F.lit(float(b0)) + F.lit(float(b1)) * F.col("x")), P_DP)
    resid = F.col("s") - F.col("n") * lam
    return [
        F.sum(resid).alias("u0"),
        F.sum(F.col("x") * resid).alias("u1"),
        F.sum(F.col("n") * lam).alias("i00"),
        F.sum(F.col("n") * F.col("x") * lam).alias("i01"),
        F.sum(F.col("n") * F.col("x") * F.col("x") * lam).alias("i11"),
    ]


def poisson_newton(suff: DataFrame, n_iter: int = 3) -> tuple[float, float]:
    """Fit (intercept, slope) of a log-link Poisson rate model by
    ``n_iter`` Newton steps over the (x, n, s) sufficient statistics.

    Unlike the logistic fit, Newton on the canonical log link DIVERGES
    from β = 0 when the mean response is far from 1 (the first step
    lands at e^Σ… scale), so β starts at the saturated-intercept point
    (ln(Σs/Σn), 0) — computed IN SQL with the same 9-dp quantization,
    so the oracle's CTE chain replays the identical trajectory."""
    suff = suff.persist()
    try:
        row = suff.agg(
            F.round(F.log(F.sum("s") / F.sum("n")), BETA_DP).alias("b0")
        ).collect()[0]
        if row["b0"] is None:
            raise ValueError(
                "poisson Newton init degenerate: mean response is zero "
                "or the sufficient-statistic frame is empty"
            )
        b0, b1 = float(row["b0"]), 0.0
        for _ in range(n_iter):
            sums = suff.agg(*_poisson_step_exprs(b0, b1))
            det = F.col("i00") * F.col("i11") - F.col("i01") * F.col("i01")
            # try_divide: see logistic_newton — NULL on det == 0,
            # bit-identical quotient otherwise.
            row = sums.select(
                F.round(
                    F.lit(b0)
                    + F.try_divide(
                        F.col("i11") * F.col("u0") - F.col("i01") * F.col("u1"),
                        det,
                    ),
                    BETA_DP,
                ).alias("b0"),
                F.round(
                    F.lit(b1)
                    + F.try_divide(
                        F.col("i00") * F.col("u1") - F.col("i01") * F.col("u0"),
                        det,
                    ),
                    BETA_DP,
                ).alias("b1"),
            ).collect()[0]
            b0, b1 = _finite_beta(row, "poisson")
        return b0, b1
    finally:
        suff.unpersist()


def poisson_step_sql(prev_cte: str, suff_cte: str) -> str:
    """DuckDB replay of one Poisson-Newton step (see
    :func:`newton_step_sql` for the structure)."""
    return f"""
  SELECT round(m.b0 + (m.i11 * m.u0 - m.i01 * m.u1)
               / (m.i00 * m.i11 - m.i01 * m.i01), {BETA_DP}) AS b0,
         round(m.b1 + (m.i00 * m.u1 - m.i01 * m.u0)
               / (m.i00 * m.i11 - m.i01 * m.i01), {BETA_DP}) AS b1
  FROM (
    SELECT any_value(b0) AS b0, any_value(b1) AS b1,
           SUM(s - n * lam) AS u0,
           SUM(x * (s - n * lam)) AS u1,
           SUM(n * lam) AS i00,
           SUM(n * x * lam) AS i01,
           SUM(n * x * x * lam) AS i11
    FROM (
      SELECT prev.b0, prev.b1, t.x, t.n, t.s,
             round(exp(prev.b0 + prev.b1 * t.x), {P_DP}) AS lam
      FROM {suff_cte} t CROSS JOIN {prev_cte} prev
    )
  ) m
"""
