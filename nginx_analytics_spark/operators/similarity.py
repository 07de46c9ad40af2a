"""Similarity search over embedding columns (SURVEY.md §7 M6).

An ``array<float>`` embedding column is searched two ways:

  * :func:`brute_force_topk` — exact cosine top-k. The query side is tiny
    (broadcast); the corpus side streams through one codegen'd stage of
    ``zip_with``/``aggregate`` arithmetic. Exact, and at 100 TB still the
    right *verification* path and the right plan for small query batches
    (cost = one corpus scan per batch, no index build).
  * :func:`hyperplane_lsh_*` — random-hyperplane (SRP) signatures bucket the
    corpus so candidate generation is a hash join instead of a cross
    product; exact cosine re-ranks only candidates. This is the scale path:
    signature build is one scan, bucket join shuffles only (id, bucket).

Two arithmetic paths, chosen per use:
  * oracle-matched exact paths fold with JVM higher-order functions
    (``aggregate(zip_with(...))``) — deterministic fold order, bit-exact
    against the SQL twin;
  * the LSH hot paths (signature build, candidate re-rank) use
    Arrow-batched numpy kernels (``pandas_udf``) — Spark executes HOFs on
    the interpreted expression path, so at volume the vectorized kernel
    wins by ~10-30x; sign/rounding agreement with the HOF formulation is
    asserted by tests.
Hyperplanes are a deterministic seeded constant (driver-generated, shipped
in the UDF closure / as array literals), so results are reproducible
run-to-run and across cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nginx_analytics_spark.functions.rounding import half_up


def as_double(vec: Column | str) -> Column:
    """float[] -> double[] so all arithmetic folds in float64."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic, oracle-bit-exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_batch(a: Column, b: Column) -> Column:
    """Arrow-batched numpy cosine for candidate re-ranking.

    The sequential-fold :func:`cosine` is kept for the oracle-matched exact
    paths (its fold order is bit-identical to the SQL twin); candidate
    re-ranks after an LSH band join are rows-only checked and volume-bound
    — there the interpreted higher-order-function fold costs ~100us/pair,
    while this kernel does the whole Arrow batch in three einsums. numpy's
    pairwise summation differs from the sequential fold only below 1e-12
    relative — irrelevant at the 6-dp reporting precision.
    """
    @F.pandas_udf("double")
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype="float64")
        x = np.stack(xs.to_numpy())
        y = np.stack(ys.to_numpy())
        num = np.einsum("ij,ij->i", x, y)
        den = np.sqrt(np.einsum("ij,ij->i", x, x) * np.einsum("ij,ij->i", y, y))
        return pd.Series(num / den)

    return _cos(a, b)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k corpus neighbors for each query vector.

    ``queries`` is broadcast (a query batch is small by construction), so
    the join is a broadcast nested loop over one corpus scan — no corpus
    shuffle. Ranking rounds the cosine first and tie-breaks on neighbor id,
    making the top-k set deterministic and oracle-comparable.
    """
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("cv"))
    q = queries.select(F.col(query_id_col), as_double(vec_col).alias("qv"))
    scored = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        half_up(cosine(F.col("qv"), F.col("cv")), round_to).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            "cosine",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


def _check_srp_banding(n_planes: int, bands: int) -> None:
    """Fail loudly on degenerate SRP banding (r11 ADVICE): every banded
    path computes ``chunk = n_planes // bands`` and masks with
    ``(1 << chunk) - 1``, so ``bands > n_planes`` makes chunk=0/mask=0 —
    every row hashes to band_hash=0 and the band join degenerates to a
    silent full cross product — and ``n_planes % bands != 0`` silently
    drops the signature's top ``n_planes % bands`` bits from banding.
    Both are recall-affecting misconfiguration, the class this module
    raises on (the PQ path's ``dim % m`` check is the model)."""
    if bands < 1 or bands > n_planes:
        raise ValueError(
            f"SRP banding needs 1 <= bands <= n_planes, got bands={bands}, "
            f"n_planes={n_planes} — bands > n_planes makes every band chunk "
            "0 bits wide, so all rows collide in one bucket (a silent full "
            "cross product instead of LSH pruning)"
        )
    if n_planes % bands:
        raise ValueError(
            f"n_planes={n_planes} not divisible by bands={bands} — the top "
            f"{n_planes % bands} signature bits would be silently excluded "
            "from every band, quietly changing recall; pick bands that "
            "divide n_planes"
        )


# Background-collision budget for AT-REST SRP banding (r12 verdict item
# 6, promoting the measured X85 scaling law from SCALING.md to a loud
# check): two UNRELATED near-orthogonal vectors agree on any given
# signature bit with p≈1/2, so a (n_planes, bands) config puts a random
# pair in the same bucket of SOME band with probability
# 1 - (1 - 2^-chunk)^bands, chunk = n_planes // bands. That fraction is
# the index's background candidate rate — the term that grows with the
# SQUARE of corpus size in every probe's candidate join. Measured
# (SCALING.md r12, 100-batch X85 horizon on the sf0.1 embeddings):
#   32 planes / 8 bands → chunk 4, background ≈ 0.40 → per-batch wall
#     drifted +80% across the horizon (candidate volume tracks corpus);
#   64 planes / 8 bands → chunk 8, background ≈ 0.031 → walls flat
#     (7.3/6.8/6.8 s), per-batch cost independent of corpus size.
# The threshold sits between those two measured points: configurations
# above it are fine for one-shot pair queries at fixture scale but make
# an at-rest index's probe cost scale with the corpus — exactly the
# failure the index exists to prevent.
SRP_BG_COLLISION_WARN = 0.05


def _check_srp_background_collisions(
    n_planes: int, bands: int, strict: bool = False
) -> None:
    """Warn (or raise, ``strict=True``) when an at-rest SRP banding
    config's expected background-collision fraction exceeds
    :data:`SRP_BG_COLLISION_WARN` — see the constant's derivation and
    the measured 32-vs-64-plane table it cites. Called by
    :func:`srp_band_keys` (and therefore every index write/append);
    the one-shot pair queries keep their own banding checks only,
    because their candidate volume is paid once, not per batch
    forever."""
    import warnings

    chunk = n_planes // bands
    expect = 1.0 - (1.0 - 2.0 ** -chunk) ** bands
    if expect > SRP_BG_COLLISION_WARN:
        msg = (
            f"SRP banding (n_planes={n_planes}, bands={bands}) expects "
            f"~{expect:.1%} of UNRELATED vector pairs to share a band "
            f"bucket (chunk={chunk} bits; threshold "
            f"{SRP_BG_COLLISION_WARN:.0%}). On an at-rest index this "
            "background rate makes every probe's candidate volume grow "
            "with the corpus — measured on the 100-batch ingest "
            "horizon, 32-plane signing drifted +80% per-batch wall "
            "while 64-plane stayed flat (SCALING.md r12). Raise "
            "n_planes (keeping bands, e.g. 64/8 -> 8-bit chunks) or "
            "pass strict=False knowingly for a fixture-scale index."
        )
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=3)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constant).

    Generated once per plan from a fixed seed; shipped to executors as an
    array literal, so signatures are stable across runs and cluster sizes.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def srp_signature_batch(vec: Column, planes: list[list[float]]) -> Column:
    """Arrow-batched SRP signature: one matmul against the plane matrix per
    Arrow batch instead of n_planes interpreted-HOF dot products per row.

    The HOF formulation (:func:`srp_signature`) runs on Spark's interpreted
    expression path (see the engine's HOF note) and was the dominant cost of
    both LSH bench queries; this kernel is the same sign decisions — bit
    i = 1 iff dot(v, plane_i) > 0 — packed identically (asserted equal to
    the HOF variant on the fixture by tests/test_dataops.py). numpy matmul's
    pairwise summation can differ from the sequential fold only when a dot
    product sits within ~1e-12 of zero, which a continuous-distribution
    embedding hits with probability ~0."""
    mat = np.asarray(planes, dtype=np.float64)
    weights = 1 << np.arange(mat.shape[0], dtype=np.uint64)

    @F.pandas_udf("long")
    def _sig(xs: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype="int64")
        x = np.stack(xs.to_numpy())
        bits = (x @ mat.T) > 0
        return pd.Series((bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64))

    return _sig(vec)


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection signature: bit i = 1 iff dot(v, plane_i) > 0.

    Returned as one long (n_planes <= 64). Reference formulation (JVM
    higher-order functions, fully deterministic fold order); the hot paths
    use :func:`srp_signature_batch` — keep the two in agreement."""
    plane_lits = [
        F.array(*[F.lit(float(x)) for x in p]) for p in planes
    ]
    bits = [
        F.when(dot(vec, pl) > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(
            F.lit(0).cast("bigint")
        )
        for i, pl in enumerate(plane_lits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def hyperplane_lsh_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    bands: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_to: int = 6,
    block: int = 2048,
    bucket_warn_cap: int | None = None,
) -> DataFrame:
    """Corpus self near-dup pairs by SRP-LSH buckets + exact cosine verify —
    the scale path for :func:`dedup.embedding_dedup_pairs`.

    Same banding as :func:`hyperplane_lsh_topk` but corpus-vs-itself.
    The verify stage runs INSIDE each (band_idx, band_val) bucket as one
    Arrow-batched blocked matmul (``applyInPandas``): every bucket member
    ships its vector ONCE per band, and all intra-bucket pairwise cosines
    come from BLAS. The r1–r4 formulation materialized the candidate PAIR
    list ((id_a, id_b) band join -> distinct -> two vector re-joins ->
    per-pair kernel), which shipped each vector once per CANDIDATE — at
    the fixture's hard 0.4-threshold regime that was ~800 K pair rows x
    two 64-double vectors through Arrow (~3.8 s at sf0.1); the bucket
    kernel sends 8 x n vector rows total and cut the query to well under
    half that. Pairs passing the threshold are deduped across bands by a
    tiny groupBy (identical floats: the per-pair dot is the same
    fixed-operand BLAS reduction in every bucket).

    Memory contract at scale: one bucket's vectors must fit one executor
    (the score matrix is blocked, ``block`` rows at a time, so only the
    vectors persist). Bucket size is corpus/2^chunk in expectation —
    choose chunk (= n_planes/bands) so that holds; the production
    regime's wider bands (below) shrink buckets another 16x. That
    expectation can be violated by a DEGENERATE corpus (many zero or
    identical-signature vectors funnel into one bucket, putting one
    executor on the whole O(n^2) score alone): pass ``bucket_warn_cap``
    to pay one extra cheap count pass (keys only, no vectors) that
    surfaces any bucket above the cap as a loud RuntimeWarning BEFORE
    the kernel runs — visibility before an executor OOMs (r5 ADVICE).
    Off by default: the oracle-checked fixture queries are known-good,
    and the warning pass is an operator's knob, not a tax on every run.

    Selectivity is parameter- AND distribution-dependent, and the honest
    formula is: background pairs (cosine ~0, P(bit match) = 1/2) collide at
    ~bands x 2^-chunk of the cross product, while a pair at cosine c
    collides with P = 1 - (1 - p^chunk)^bands, p = 1 - acos(c)/pi. The
    defaults (8 bands x 4 bits) maximize recall for the fixture's hard
    regime — near-dups at cosine 0.40-0.55, barely above background —
    where they prune only ~2x. For REAL near-dup dedup (cosine >= 0.85,
    where embedding dup detection operates), use wider bands (e.g.
    n_planes=64, bands=8 -> 8-bit chunks): background collides at ~3% of
    the cross product while recall stays >= 0.9 — the near-linear regime
    asserted by tests/test_dataops.py::test_lsh_high_threshold_selectivity.
    """
    _check_srp_banding(n_planes, bands)
    planes = hyperplanes(dim, n_planes, seed)
    chunk = n_planes // bands
    mask = (1 << chunk) - 1
    scale = float(10**round_to)
    thr = float(threshold)

    v = corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
    banded = v.select(
        F.col(id_col), F.col("v"), srp_signature_batch(F.col("v"), planes).alias("sig")
    ).select(
        id_col,
        "v",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), b * chunk).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )

    if bucket_warn_cap is not None:
        import warnings

        hot = (
            banded.groupBy("band_idx", "band_val")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > bucket_warn_cap)
            .orderBy(F.col("n").desc())
            .limit(20)
            .collect()
        )
        if hot:
            detail = ", ".join(
                f"(band {r.band_idx}, val {r.band_val}): {r.n}" for r in hot
            )
            warnings.warn(
                f"hyperplane_lsh_pairs: {len(hot)}+ LSH bucket(s) exceed "
                f"bucket_warn_cap={bucket_warn_cap} — one executor will "
                f"score each hot bucket alone ({detail}). Widen bands "
                "(larger n_planes/bands chunk) or pre-drop degenerate "
                "(zero/constant) vectors.",
                RuntimeWarning,
                stacklevel=2,
            )

    idc = id_col
    # Preserve the pre-r5 type-agnostic contract: the output id type is
    # whatever the input id column is (string keys worked in the join
    # formulation and must keep working in the kernel one).
    id_type = dict(banded.dtypes)[id_col]

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=pdf[idc].dtype),
                "id_b": pd.Series([], dtype=pdf[idc].dtype),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        order = np.argsort(pdf[idc].to_numpy(), kind="stable")
        ids = pdf[idc].to_numpy()[order]
        x = np.stack(pdf["v"].to_numpy())[order]
        sq = np.einsum("ij,ij->i", x, x)
        out = [empty]
        for s in range(0, n, block):
            e = min(n, s + block)
            # same formula as cosine_batch: num / sqrt(xx * yy)
            num = x[s:e] @ x.T
            c = np.floor(num / np.sqrt(np.outer(sq[s:e], sq)) * scale + 0.5) / scale
            rows, cols = np.nonzero(c >= thr)
            keep = cols > rows + s  # ids ascending: position order == id order
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[rows[keep] + s],
                            "id_b": ids[cols[keep]],
                            "cosine": c[rows[keep], cols[keep]],
                        }
                    )
                )
        return pd.concat(out, ignore_index=True)

    # One pandas invocation PER ARROW BATCH, not per bucket (r17, guide
    # §4): applyInPandas calls the kernel once per (band_idx, band_val)
    # GROUP, and at micro-batch shapes (the X85 loop: ~2k vectors into
    # 8x256-value bands) that is thousands of per-group pandas
    # machineries per batch — measured as ~20 s of executor time per
    # 2k-row micro-batch doing ~nothing. The rows are instead hash-
    # partitioned and sorted by the SAME keys, and a streaming
    # mapInPandas walks buckets off the sorted batches (buffering at
    # most one bucket across Arrow-batch boundaries — the standing
    # "one bucket fits one executor" contract, unchanged). Each bucket
    # hits the IDENTICAL kernel on identical operands, so every pair's
    # cosine is bit-identical to the applyInPandas formulation.
    def verify_stream(batches):
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            bi = pdf["band_idx"].to_numpy()
            bv = pdf["band_val"].to_numpy()
            change = (
                np.flatnonzero((bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])) + 1
            )
            bounds = [0, *change.tolist(), len(pdf)]
            for s, e in zip(bounds[:-2], bounds[1:-1]):
                out = verify(pdf.iloc[s:e])
                if len(out):
                    yield out
            pending = pdf.iloc[bounds[-2] :]
        if pending is not None:
            out = verify(pending)
            if len(out):
                yield out

    hits = (
        banded.repartition("band_idx", "band_val")
        .sortWithinPartitions("band_idx", "band_val")
        .mapInPandas(
            verify_stream,
            schema=f"id_a {id_type}, id_b {id_type}, cosine double",
        )
    )
    # Dedup across bands. A pair found in several buckets scored the same
    # fixed-operand BLAS dot everywhere, so max == every observation; the
    # shuffle carries only PASSING pairs (tiny), never the candidate set.
    return hits.groupBy("id_a", "id_b").agg(F.max("cosine").alias("cosine"))


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 32,
    bands: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: SRP-signature band join, exact cosine re-rank.

    Corpus and queries are signed against the same hyperplanes; a pair is a
    candidate if any band (n_planes/bands consecutive bits) matches.
    Candidates get the exact cosine; top-k per query by the same
    deterministic ordering as :func:`brute_force_topk`. Recall depends on
    (n_planes, bands) — the test suite measures it against brute force.

    Scale shape: candidate rows carry ONLY (query_id, id) through the band
    join and the distinct — vectors are re-joined afterwards (distinct over
    rows carrying two 64-double arrays measured ~5x slower). The double
    vector and signature are each materialized once per frame in separate
    projections; Catalyst's CollapseProject keeps non-cheap aliases
    referenced more than once un-inlined, so they are computed once per row.
    """
    _check_srp_banding(n_planes, bands)
    planes = hyperplanes(dim, n_planes, seed)
    chunk = n_planes // bands
    mask = (1 << chunk) - 1

    def vectors(df: DataFrame, idc: str, vname: str) -> DataFrame:
        return df.select(F.col(idc), as_double(vec_col).alias(vname))

    def banded(vecs: DataFrame, idc: str, vname: str) -> DataFrame:
        return vecs.select(
            F.col(idc), srp_signature_batch(F.col(vname), planes).alias("sig")
        ).select(
            idc,
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(F.col("sig"), b * chunk).bitwiseAND(
                            F.lit(mask)
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band_idx", "band_val"),
        )

    cv = vectors(corpus, id_col, "cv")
    qv = vectors(queries, query_id_col, "qv")
    cb = banded(cv, id_col, "cv")
    qb = banded(qv, query_id_col, "qv")
    cands = (
        cb.join(
            F.broadcast(qb),
            (cb.band_idx == qb.band_idx)
            & (cb.band_val == qb.band_val)
            & (F.col(id_col) != F.col(query_id_col)),
        )
        .select(query_id_col, id_col)
        .distinct()
    )
    scored = (
        cands.join(cv, id_col)
        .join(F.broadcast(qv), query_id_col)
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            half_up(cosine_batch(F.col("qv"), F.col("cv")), round_to).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            "cosine",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


# --------------------------------------------------------------------------
# At-rest SRP index + incremental embedding near-dups (X84) — the
# X69/X79 write→append→probe lifecycle for the EMBEDDING modality,
# mirroring operators/dedup.py's MinHash-LSH index for text
# --------------------------------------------------------------------------

SRP_INDEX_META = "_srp_meta.json"


def srp_index_meta_path(path: str) -> str:
    return f"{path.rstrip('/')}/{SRP_INDEX_META}"


def read_srp_index_meta(path: str, fs=None) -> dict:
    """Load the SRP index's parameter sidecar. Raises FileNotFoundError
    for a pre-sidecar (or foreign) directory — a probe signed under
    different (n_planes, bands, dim, seed) hashes into disjoint buckets
    and silently returns ~nothing, the same failure mode
    ``_lsh_meta.json`` guards for the text index."""
    from nginx_analytics_spark.operators.index_fs import read_json_sidecar

    return read_json_sidecar(path, SRP_INDEX_META, fs=fs)


def _check_srp_index_meta(index_path: str, want: dict, fs=None) -> None:
    try:
        have = read_srp_index_meta(index_path, fs=fs)
    except FileNotFoundError as e:
        raise ValueError(
            f"SRP index at {index_path!r} has no {SRP_INDEX_META} sidecar — "
            "rebuild it with write_srp_index (probing an index of unknown "
            "signing parameters silently loses recall)"
        ) from e
    # full-dict comparison, matching the text twin's _check_lsh_index_meta:
    # a sidecar carrying extra/renamed parameters is just as foreign as a
    # mismatched value (r11 review — the twins must not drift)
    if have != want:
        raise ValueError(
            f"SRP index at {index_path!r} was built under different "
            f"parameters: sidecar {have}, caller {want} — "
            "probe with the index's parameters or rebuild"
        )


def srp_band_keys(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    seed: int = 42,
    strict: bool = False,
) -> DataFrame:
    """(id, band_idx, band_hash) SRP bucket keys — the banding expression
    :func:`hyperplane_lsh_pairs`/:func:`hyperplane_lsh_topk` join on,
    exposed as the at-rest index's row format. The key column is named
    ``band_hash`` (matching the text index's schema) so the
    ``index_fs`` ``store_*`` seam and its sort-within-band layout apply
    verbatim. One Arrow matmul signature pass; the planes are fully
    derived from (dim, n_planes, seed), so the sidecar stores only
    parameters, never the matrix.

    Because these keys feed AT-REST indexes (whose probe cost pays the
    background-collision rate on every batch forever), the banding is
    additionally budget-checked: a config whose expected unrelated-pair
    collision fraction exceeds :data:`SRP_BG_COLLISION_WARN` warns —
    or raises with ``strict=True`` — citing the measured 32-vs-64-plane
    horizon (r12 verdict item 6). Accordingly the at-rest entry points
    (this, :func:`write_srp_index`, :func:`append_srp_index`,
    :func:`incremental_embedding_near_dups`) default to ``n_planes=64``
    — the ingest loops' measured-good config — since r13's ADVICE
    caught the 32-plane default warning against itself; 32 remains
    available (and default on the one-shot pair/topk queries, whose
    candidate volume is paid once, not per batch forever).

    UPGRADE NOTE (r14 → r15, the r8 lock-relocation-note precedent):
    indexes built before the 32→64-plane default bump keep working
    untouched — :func:`append_srp_index` and
    :func:`incremental_embedding_near_dups` now default their signing
    parameters to the index SIDECAR's recorded values, so standing
    ingest loops that relied on library defaults keep signing at the
    index's own 32 planes. Only callers passing ``n_planes``
    EXPLICITLY assert a configuration (a mismatch raises, as ever);
    to move an old index to 64 planes, rebuild it
    (:func:`write_srp_index` on the corpus, or ``jobs`` rebuild)."""
    _check_srp_banding(n_planes, bands)
    _check_srp_background_collisions(n_planes, bands, strict=strict)
    planes = hyperplanes(dim, n_planes, seed)
    chunk = n_planes // bands
    mask = (1 << chunk) - 1
    v = emb.select(F.col(id_col), as_double(vec_col).alias("v"))
    return v.select(
        F.col(id_col), srp_signature_batch(F.col("v"), planes).alias("sig")
    ).select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), b * chunk).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


def write_srp_index(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    seed: int = 42,
    strict: bool = False,
    fs=None,
    keys: DataFrame | None = None,
) -> None:
    """Materialize the embedding corpus's SRP index AT REST: (id,
    band_idx, band_hash) rows, partitioned by band_idx and sorted by
    band_hash within each band — a probe reads matching band
    partitions and row groups, never the corpus's vectors. The index is
    bands x corpus rows of three longs (vector payloads stay in the
    corpus table), so per-batch near-dup checks touch this table plus
    only the CANDIDATES' vectors. A ``_srp_meta.json`` sidecar pins
    (id_col, n_planes, bands, dim, seed); probes validate it first.

    Storage layout is the fs seam's to own, exactly like the text
    index: the shared index_fs.banded_index_write (a seam exposing
    ``store_write`` — ManifestIndexFS — gets the writes delegated
    wholesale)."""
    from nginx_analytics_spark.operators.index_fs import (
        banded_index_write,
        write_json_sidecar,
    )

    if keys is None:
        keys = srp_band_keys(
            emb, id_col, vec_col, n_planes, bands, dim, seed, strict=strict
        )
    banded_index_write(keys, path, fs=fs, bands=bands)
    meta = {
        "id_col": id_col,
        "n_planes": n_planes,
        "bands": bands,
        "dim": dim,
        "seed": seed,
    }
    write_json_sidecar(path, SRP_INDEX_META, meta, fs=fs)


def _resolve_srp_params(
    index_path: str,
    id_col: str,
    n_planes: int | None,
    bands: int | None,
    dim: int | None,
    seed: int | None,
    fs=None,
) -> tuple[int, int, int, int]:
    """Resolve signing parameters against an EXISTING index's sidecar:
    ``None`` adopts the sidecar's recorded value (r14 ADVICE — a
    standing ingest loop keeps working across library default changes,
    e.g. the r14 32→64-plane bump, because the index itself is the
    authority on how its keys were signed); explicit values are
    validated against the sidecar as before (a mismatch is loud,
    never a silent poisoning). Returns (n_planes, bands, dim, seed)."""
    try:
        have = read_srp_index_meta(index_path, fs=fs)
    except FileNotFoundError as e:
        raise ValueError(
            f"SRP index at {index_path!r} has no {SRP_INDEX_META} "
            "sidecar — rebuild it with write_srp_index (probing an "
            "index of unknown signing parameters silently loses recall)"
        ) from e
    n_planes = int(have["n_planes"] if n_planes is None else n_planes)
    bands = int(have["bands"] if bands is None else bands)
    dim = int(have["dim"] if dim is None else dim)
    seed = int(have["seed"] if seed is None else seed)
    _check_srp_index_meta(
        index_path,
        {
            "id_col": id_col,
            "n_planes": n_planes,
            "bands": bands,
            "dim": dim,
            "seed": seed,
        },
        fs=fs,
    )
    return n_planes, bands, dim, seed


def append_srp_index(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    bands: int | None = None,
    dim: int | None = None,
    seed: int | None = None,
    strict: bool = False,
    fs=None,
    keys: DataFrame | None = None,
) -> None:
    """Fold a new batch into an existing SRP index WITHOUT re-signing
    the corpus: sign only the batch, append into the same band
    partitions (the X79 ``append_lsh_index`` analogue). The sidecar is
    validated first — appending keys signed under different planes
    would poison the index silently.

    Signing parameters default to ``None`` = WHATEVER THE SIDECAR
    RECORDS (r14 ADVICE): the index being appended to is the authority
    on how its keys were signed, so a standing ingest loop survives
    library-default changes (the r14 32→64-plane bump would otherwise
    turn every default-parameter append against a pre-r14 index into a
    parameter-mismatch error — loud, but an operational break). Pass
    values explicitly to ASSERT a configuration; a mismatch still
    raises.

    Each append adds one file per touched band; a long-running
    embedding ingest loop reclaims the file population with
    :func:`compact_srp_index` (the X82 per-band compaction, shared
    with the text index), exactly as ``append_lsh_index`` points at
    ``compact_lsh_index``.

    ``keys`` (r16): an already-signed (id, band_idx, band_hash) frame
    for exactly these rows — the X85 loop signs each batch once and
    hands the novel subset here, skipping a second signing matmul.
    The sidecar resolution/validation above still runs; the caller
    owns the keys-match-sidecar contract."""
    n_planes, bands, dim, seed = _resolve_srp_params(
        path, id_col, n_planes, bands, dim, seed, fs=fs
    )
    from nginx_analytics_spark.operators.index_fs import banded_index_write

    if keys is None:
        keys = srp_band_keys(
            new_emb, id_col, vec_col, n_planes, bands, dim, seed,
            strict=strict,
        )
    banded_index_write(keys, path, fs=fs, mode="append", bands=bands)


def compact_srp_index(
    spark,
    path: str,
    max_files_per_band: int | None = None,
    target_files: int | None = None,
    target_file_bytes: int | None = None,
    max_concurrency: int | None = None,
    fs=None,
    prune_ids: DataFrame | None = None,
) -> dict:
    """X82 per-band compaction for the SRP embedding index — the same
    maintenance half :func:`dedup.compact_lsh_index` gives the text
    index, because the two indexes share one at-rest format by
    construction (``(id, band_idx, band_hash)`` rows through
    ``index_fs.banded_index_write``): only bands whose parquet file
    count exceeds ``max_files_per_band`` are rewritten (range-
    partitioned, band_hash-sorted, non-overlapping min/max — best-case
    row-group pruning), healthy bands stay byte-untouched, and the
    ``_srp_meta.json`` sidecar is untouched so probes keep validating
    against the same signing parameters.

    The implementation IS the text index's: this validates the SRP
    sidecar (loud on a non-index dir), takes the same sibling
    ``<path>.compact.lock`` single-compactor mutex, and enters the
    modality-agnostic locked body ``dedup._compact_lsh_index_locked``
    — which touches only ``band_idx=`` dirs through the ``fs`` seam
    and never reads a signature, so its crash-recovery swap
    discipline, concurrency bound, per-band output sizing, and
    manifest-layout (``store_compact``) dispatch all apply verbatim
    (r11 verdict item 1: one storage contract, one compactor, two
    signing modalities). Defaults are the shared X82 module constants.
    Returns the same stats dict for caller telemetry.

    ``prune_ids`` (r13 verdict item 4): optional one-column frame of
    surviving corpus ids — rewritten bands drop orphan band rows
    during the rewrite (see ``dedup._compact_lsh_index_locked``), so a
    heavy orphan load X91's ``reconcile_index`` reports is reclaimed
    by the maintenance pass already running, without a full rebuild;
    ``max_files_per_band=0`` force-rewrites every band for a full
    reclaim."""
    from nginx_analytics_spark.operators import dedup
    from nginx_analytics_spark.operators.index_fs import LOCAL_FS

    fs = fs or LOCAL_FS
    read_srp_index_meta(path, fs=fs)  # loud on a non-index dir
    kwargs = dict(
        max_files_per_band=max_files_per_band,
        target_files=target_files,
        target_file_bytes=target_file_bytes,
        max_concurrency=max_concurrency,
        prune_ids=prune_ids,
    )
    kwargs = {k: v for k, v in kwargs.items() if v is not None}
    with fs.exclusive_lock(
        dedup._lsh_compact_lock_path(path),
        "X82 is single-compactor by design (interleaved band swaps "
        "would corrupt the two-rename discipline); run compaction "
        "from the embedding ingest loop's one writer thread",
    ):
        return dedup._compact_lsh_index_locked(spark, path, fs=fs, **kwargs)


def read_srp_index_rows(spark, path: str, fs=None) -> DataFrame:
    """The SRP index's logical row view (id, band_idx, band_hash),
    whatever the storage layout — the dedup.read_lsh_index_rows twin."""
    from nginx_analytics_spark.operators.index_fs import banded_index_read

    return banded_index_read(spark, path, fs=fs)


def incremental_embedding_near_dups(
    spark,
    new_emb: DataFrame,
    corpus_emb: DataFrame,
    index_path: str,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    bands: int | None = None,
    dim: int | None = None,
    seed: int | None = None,
    round_to: int | None = 6,
    exact_net: bool = False,
    fs=None,
    new_keys: DataFrame | None = None,
) -> DataFrame:
    """Semantic near-dup pairs (new_id, old_id, cosine) of an incoming
    embedding batch against an indexed corpus, WITHOUT re-signing the
    corpus — the embedding-modality twin of
    :func:`dedup.incremental_near_dups` (X69's probe over X79's
    maintained index):

      1. sign + band ONLY the new batch (one Arrow matmul);
      2. band-join against the at-rest index — the probe reads matching
         band partitions, never corpus vectors;
      3. exact-cosine-verify candidates only: the corpus VECTOR scan is
         semi-join-pruned to candidate ids first.

    Per-batch cost scales with the batch and its collision volume, not
    the corpus — the production recurrence for continuous semantic
    dedup of an embedding stream. Recall at a given threshold follows
    the SRP banding odds (hyperplane_lsh_pairs' selectivity note);
    ``exact_net=True`` unions the output with the cross-set exact plan
    (recall 1 by construction) for oracle-checkable tiers, using the
    deterministic sequential-fold :func:`cosine` on BOTH sides so the
    union's distinct collapses duplicates bit-exactly; the pure-LSH
    path (the 100 TB shape) re-ranks with the Arrow :func:`cosine_batch`
    kernel instead.

    Signing parameters default to the SIDECAR'S recorded values (r14
    ADVICE, same contract as :func:`append_srp_index`): the probe must
    sign the batch exactly as the index was signed, so the index is
    the authority; pass values explicitly only to assert a config.

    ``new_keys`` (r16): a caller that already signed the batch (the X85
    loop signs once per micro-batch for probe AND append) passes its
    (id_col, band_idx, band_hash) frame and the probe skips the signing
    matmul. Caller contract: built by :func:`srp_band_keys` under this
    index's sidecar parameters."""
    n_planes, bands, dim, seed = _resolve_srp_params(
        index_path, id_col, n_planes, bands, dim, seed, fs=fs
    )
    new_v = new_emb.select(
        F.col(id_col).alias("new_id"), as_double(vec_col).alias("nv")
    )
    if new_keys is None or exact_net:
        # consumed by sign AND verify (AND net): materialize once. With
        # caller-supplied keys and no net, the verify broadcast below is
        # the ONE consumer — its build reads the caller's checkpointed
        # batch directly, so the extra materialization job is skipped
        # (r17, one fewer job per X85 micro-batch).
        new_v = new_v.localCheckpoint(eager=True)
    if new_keys is None:
        new_keys = srp_band_keys(
            new_v, "new_id", "nv", n_planes, bands, dim, seed
        )
    else:
        new_keys = new_keys.withColumnRenamed(id_col, "new_id")
    idx = read_srp_index_rows(spark, index_path, fs=fs).withColumnRenamed(
        id_col, "old_id"
    )
    cands = (
        # BROADCAST the batch keys (r17, guide §3.1): the index side is
        # corpus-sized and was shuffled by this join on every probe; the
        # batch-side keys are batch-sized by contract, so the index now
        # streams through its scan with no exchange.
        F.broadcast(new_keys).join(idx, ["band_idx", "band_hash"])
        .filter(F.col("new_id") != F.col("old_id"))
        .select("new_id", "old_id")
        .distinct()
        # collision-volume-sized and consumed TWICE (the semi-join prune
        # below and the verify join) — checkpoint so the batch signing
        # matmul and the index band-join run once per probe, as the
        # docstring's step 1 promises (r11 review)
        .localCheckpoint(eager=True)
    )
    # Candidate-id set is collision-volume-sized (the same contract that
    # lets new_v broadcast below), so the corpus prune is a BROADCAST
    # semi-join by declaration — the corpus side streams through one
    # scan, never sorts/shuffles (plan-audited r11: AQE left this one
    # as a sort-merge join without the hint).
    pruned_old = corpus_emb.join(
        F.broadcast(cands.select(F.col("old_id").alias(id_col)).distinct()),
        id_col,
        "left_semi",
    )
    # fan the pruned rows out when the corpus scan has fewer natural
    # splits than cores — the Arrow cosine verify otherwise serializes
    # onto them; no-op at scale (r17, the X80 probes' twin rule — the
    # r16 attempt fanned the WHOLE scan ahead of the batch checkpoint
    # and lost; this exchanges only the collision-sized pruned set)
    if (
        corpus_emb.rdd.getNumPartitions()
        < spark.sparkContext.defaultParallelism
    ):
        pruned_old = pruned_old.repartition(
            spark.sparkContext.defaultParallelism
        )
    old_v = pruned_old.select(
        F.col(id_col).alias("old_id"), as_double(vec_col).alias("ov")
    )

    def score(pairs: DataFrame) -> DataFrame:
        c = (
            cosine(F.col("nv"), F.col("ov"))
            if exact_net
            else cosine_batch(F.col("nv"), F.col("ov"))
        )
        if round_to is not None:
            c = half_up(c, round_to)
        return pairs.select("new_id", "old_id", c.alias("cosine")).filter(
            F.col("cosine") >= threshold
        )

    # The first verify join broadcasts the BATCH vectors (batch-sized by
    # contract); the join to the pruned corpus vectors stays planner-
    # chosen — candidate volume scales with corpus x batch at the SRP
    # background-collision rate, so neither side of THAT join may be
    # force-broadcast (r17: an attempt to broadcast the joined
    # cands x vectors frame hit ~0.5 GB per batch by corpus growth and
    # collapsed the loop into GC).
    verified = score(
        cands.join(F.broadcast(new_v), "new_id").join(old_v, "old_id")
    )
    if not exact_net:
        return verified
    full_old = corpus_emb.select(
        F.col(id_col).alias("old_id"), as_double(vec_col).alias("ov")
    )
    net = score(
        full_old.join(
            F.broadcast(new_v), F.col("new_id") != F.col("old_id")
        )
    )
    return verified.unionByName(net).distinct()


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path, complementary to LSH
# --------------------------------------------------------------------------


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    id_col: str = "vec_id",
    sample_cap: int = 4096,
) -> np.ndarray:
    """Fit the IVF coarse quantizer: seeded k-means over a DETERMINISTIC
    corpus sample, so the fit is layout-invariant.

    The pre-r11 fit (seeded MLlib KMeans over the distributed corpus)
    sampled per partition, so the same row multiset in a different
    physical order could fit different centroids — measured recall
    spread ~±0.1-0.2 at a fixed config on unstructured geometry
    (SCALING.md r10 sweep). Now the sample is chosen by PORTABLE HASH —
    order by (xxhash64(id), id), a pure function of the rows in the
    spirit of operators/sampling.py (the hash IS the rank: there is no
    need for portable_frac's [0,1) mapping here, and its Weyl multiply
    is domain-bounded to row-id-sized keys anyway) — and the fit runs
    the seeded driver-side Lloyd kernel PQ already uses (:func:`_lloyd`),
    so (row multiset, params) -> centroids is a pure function: permuting
    or repartitioning the corpus yields bit-identical centroids
    (tests/test_dataops.py::test_ivf_centroids_layout_invariant).

    The model is (n_cells x dim) — a driver-side constant like the SRP
    hyperplanes, shipped to executors in UDF closures. A quantizer
    converges on a sketch of the distribution, so ``sample_cap`` rows
    suffice at any corpus scale (the pq_codebooks rationale) — but the
    sample must also carry the CELL COUNT: the effective cap is
    ``max(sample_cap, 32 * n_cells)`` (below ~a-few-dozen points per
    centroid the k-means++ seeding degenerates toward duplicate
    centroids and empty cells — the r11 review's n_cells ~ sqrt(n)
    scenario), and fewer sampled rows than centroids raises outright.
    The orderBy+limit compiles to TakeOrderedAndProject — per-partition
    top-k merged on the driver, never a full sort shuffle. The third
    sort key (xxhash64 of the id AND vector) only matters for corpora
    with DUPLICATE ids: it makes the boundary cut row-determined there
    too, so layout invariance needs no uniqueness precondition (for
    unique ids the first two keys already decide, and the sample — and
    therefore every measured recall number — is unchanged).
    """
    cap = max(sample_cap, 32 * n_cells)
    ranked = (
        corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
        .orderBy(
            F.xxhash64(F.col(id_col)).asc(),
            F.col(id_col).asc(),
            F.xxhash64(F.col(id_col), F.col("v")).asc(),
        )
        .limit(cap)
    )
    rows = ranked.collect()
    if not rows:
        raise ValueError("empty corpus")
    if len(rows) < n_cells:
        raise ValueError(
            f"corpus sample has {len(rows)} rows < n_cells={n_cells} — "
            "cannot fit more centroids than points"
        )
    x = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    return _lloyd(x, n_cells, seed, max_iter)


def cell_assignment(vec: Column, centroids: np.ndarray) -> Column:
    """``struct<cell:int, adist:double>`` — the nearest centroid id plus
    the TRUE squared-L2 assignment distance. Same argmin decisions as
    ``nearest_cells(vec, c, 1)[0]`` (first minimum == stable-argsort
    head); the distance is what the index stores per row so the drift
    monitor (:func:`ivf_append_bucketed`'s stats) is a column scan, not
    a recompute. Arrow-batched: one matmul per batch."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    cnorm = np.einsum("ij,ij->i", cents, cents)

    @F.pandas_udf("struct<cell:int, adist:double>")
    def _asg(xs: pd.Series) -> pd.DataFrame:
        if len(xs) == 0:
            return pd.DataFrame({"cell": pd.Series([], dtype="int32"),
                                 "adist": pd.Series([], dtype="float64")})
        x = np.stack(xs.to_numpy())
        part = cnorm - 2.0 * (x @ cents.T)  # |c|^2 - 2 x.c
        idx = np.argmin(part, axis=1)
        dist = part[np.arange(len(x)), idx] + np.einsum("ij,ij->i", x, x)
        return pd.DataFrame(
            {"cell": idx.astype(np.int32), "adist": dist}
        )

    return _asg(vec)


def nearest_cells(vec: Column, centroids: np.ndarray, nprobe: int) -> Column:
    """``array<int>`` of the ``nprobe`` nearest centroid ids (squared
    euclidean, deterministic tie-break by cell id via stable argsort).
    Arrow-batched: one matmul per batch against the centroid matrix."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    cnorm = np.einsum("ij,ij->i", cents, cents)
    probe = int(nprobe)

    @F.pandas_udf("array<int>")
    def _nc(xs: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype="object")
        x = np.stack(xs.to_numpy())
        # argmin of |x-c|^2 = argmin(|c|^2 - 2 x.c); |x|^2 is row-constant
        d = cnorm - 2.0 * (x @ cents.T)
        idx = np.argsort(d, axis=1, kind="stable")[:, :probe].astype(np.int32)
        return pd.Series(list(idx))

    return _nc(vec)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    round_to: int = 6,
    max_iter: int = 8,
) -> DataFrame:
    """Approximate top-k via an inverted-file index: corpus vectors live in
    exactly ONE cell (nearest centroid); each query probes its ``nprobe``
    nearest cells and brute-forces only those cells' vectors.

    vs LSH: cells partition the corpus, so candidates need no ``distinct``
    (a corpus vector meets a query at most once) and the scanned fraction
    is a hard ~nprobe/n_cells. At rest this pruning is storage-level:
    :func:`ivf_write_bucketed` materializes the corpus partitioned by
    ``cell`` with the centroids in a validated sidecar, and
    :func:`ivf_topk_bucketed` probes it with an ``IN`` partition filter
    so unprobed cells' files are never opened (proven at the file level
    by tests/test_dataops.py::test_ivf_bucketed_at_rest_prunes_files);
    here, in-memory, the same pruning is a hash join on ``cell``. Recall
    depends on (n_cells, nprobe) — measured against brute force in the
    test suite.

    Calibration rule (r10 grown-fixture measurement, SCALING.md): on
    unstructured (uniform-sphere) geometry, recall tracks the SCAN
    FRACTION nprobe/n_cells, not either knob alone — measured at 10×
    the fixture corpus, 38% fraction gives recall@5 ≈ 0.76 at 16, 45,
    and 64 cells alike, while dropping the fraction to 13% at fixed 45
    cells drops recall to 0.50. So hold the fraction for recall and
    size n_cells for partition granularity (n_cells ~ sqrt(n) is the
    standard choice; more, smaller cells = finer at-rest pruning and
    better rewrite parallelism at the same recall). One caveat: on
    CLUSTERED real embeddings the fraction needed for a target recall
    is far lower (that is IVF's design case). Calibrate against
    :func:`brute_force_topk` on a sample, like PQ's refine rule. (The
    r10 sweep's second caveat — fit sensitivity to physical row order —
    is gone: :func:`ivf_centroids` now fits on a portable-hash sample,
    so centroids are a pure function of the row multiset.)
    """
    centroids = ivf_centroids(corpus, n_cells, vec_col, seed, max_iter, id_col)
    cv = corpus.select(F.col(id_col), as_double(vec_col).alias("cv"))
    # Assignment goes through the SAME kernel as the at-rest write path
    # (cell_assignment), so the ann_ivf_indexed == ann_ivf_topk row
    # identity is structural — one kernel, not two kept bit-identical
    # by discipline (r11 review).
    assigned = cv.select(
        id_col,
        "cv",
        cell_assignment(F.col("cv"), centroids)["cell"].alias("cell"),
    )
    return _ivf_score_topk(assigned, queries, centroids, k, id_col, vec_col,
                           query_id_col, nprobe, round_to)


def _ivf_score_topk(
    assigned: DataFrame,
    queries: DataFrame | None,
    centroids: np.ndarray,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    nprobe: int,
    round_to: int,
    probes: DataFrame | None = None,
) -> DataFrame:
    """Shared probe/score/top-k tail of the IVF paths: join the assigned
    corpus (id, cv, cell) against each query's nprobe probe cells, exact
    cosine inside probed cells only, per-query top-k. ``probes`` lets a
    caller that already materialized the (query_id, qv, cell) frame
    (the at-rest path needs it driver-side for the partition filter)
    pass it in instead of re-running the cell-assignment kernel."""
    if probes is None:
        qv = queries.select(
            F.col(query_id_col), as_double(vec_col).alias("qv")
        )
        probes = qv.select(
            query_id_col,
            "qv",
            F.explode(
                nearest_cells(F.col("qv"), centroids, nprobe)
            ).alias("cell"),
        )
    scored = (
        assigned.join(
            F.broadcast(probes),
            (assigned.cell == probes.cell) & (F.col(id_col) != F.col(query_id_col)),
        )
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            half_up(cosine_batch(F.col("qv"), F.col("cv")), round_to).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            "cosine",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


IVF_INDEX_META = "_ivf_meta.json"


def ivf_index_meta_path(path: str) -> str:
    return f"{path.rstrip('/')}/{IVF_INDEX_META}"


def read_ivf_index_meta(path: str, fs=None) -> dict:
    """Load the at-rest IVF index's sidecar — the fitted centroids plus
    the layout parameters they were fitted under — with ``centroids``
    already validated and converted to a (n_cells x dim) float64 array.

    Raises FileNotFoundError for a pre-sidecar (or foreign) directory
    and ValueError for a corrupt one: probing with centroids that are
    not the ones the corpus was PARTITIONED BY assigns queries to cells
    the data doesn't live in and silently zeroes recall instead of
    erroring — the same failure mode ``_lsh_meta.json`` guards against
    for the LSH index (dedup.read_lsh_index_meta)."""
    from nginx_analytics_spark.operators.index_fs import read_json_sidecar

    meta = read_json_sidecar(path, IVF_INDEX_META, fs=fs)
    cents = np.asarray(meta.get("centroids"), dtype=np.float64)
    if cents.ndim != 2 or cents.shape != (meta.get("n_cells"), meta.get("dim")):
        raise ValueError(
            f"IVF index at {path!r}: sidecar centroids shape "
            f"{cents.shape} disagrees with its own (n_cells, dim) = "
            f"({meta.get('n_cells')}, {meta.get('dim')}) — rebuild with "
            "ivf_write_bucketed"
        )
    meta["centroids"] = cents
    return meta


def ivf_write_bucketed(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    sample_cap: int = 4096,
    fs=None,
) -> np.ndarray:
    """Materialize the IVF index AT REST: the corpus written to Parquet
    partitioned by ``cell`` (one directory per inverted list), with the
    fitted centroids in a ``_ivf_meta.json`` sidecar (they ARE the
    index's metadata — ~n_cells x dim floats; json float repr
    round-trips float64 exactly, so the sidecar is bit-faithful). The
    sidecar is written atomically AFTER the data and carries the
    index's ``row_count``, so a complete sidecar marks a complete
    BUILD — and every :func:`ivf_append_bucketed` re-commits by
    flipping the sidecar's count LAST, which keeps the invariant
    honest across appends: a writer killed between the row append and
    the sidecar flip leaves ``row_count`` behind the data, which the
    next append (or :func:`ivf_index_verify`, or a ``verify=True``
    probe) detects loudly instead of silently serving a torn index
    (r11 ADVICE). Also returns the centroids for callers that probe
    immediately.

    Seam scope (r11 ADVICE): unlike the banded text/SRP indexes —
    whose ROW I/O dispatches through ``index_fs``'s ``store_*`` family
    wholesale — the IVF index's rows are always written and read with
    Spark's own parquet machinery (``partitionBy("cell")`` /
    partition-pruned reads); the ``fs`` seam here covers ONLY the
    driver-side sidecar/metadata I/O and the recluster swap's renames.
    A ManifestIndexFS-style object-store deployment therefore gets an
    atomic sidecar flip (one PUT) but plain parquet data placement;
    the ``row_count`` commit protocol above is exactly what makes that
    sufficient for torn-write DETECTION without a manifest layer.

    This is the storage layout the in-memory :func:`ivf_topk` docstring
    promises: a probe becomes PARTITION PRUNING, so a query's scan opens
    only its nprobe cells' files and the other ``n_cells - nprobe``
    inverted lists are never read (asserted at the file level in
    tests/test_dataops.py). At 100 TB this is the difference between
    scanning ~nprobe/n_cells of the corpus and scanning all of it;
    re-cluster periodically as the corpus drifts, like any IVF index.
    The registered probe is ``registry_dataops.ann_ivf_indexed``."""
    from nginx_analytics_spark.operators.index_fs import write_json_sidecar

    centroids = ivf_centroids(
        corpus, n_cells, vec_col, seed, max_iter, id_col, sample_cap
    )
    assigned = (
        corpus.select(F.col(id_col), as_double(vec_col).alias("cv"))
        .withColumn("a", cell_assignment(F.col("cv"), centroids))
        .select(id_col, "cv", F.col("a.cell").alias("cell"),
                F.col("a.adist").alias("adist"))
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    # Build-time row count + PER-CELL mean assignment distances — the
    # torn-append detector's and drift monitor's reference points —
    # computed from the written index's adist column (one column-pruned
    # re-read grouped by cell — n_cells tiny rows — not a second corpus
    # pass over the vectors). The drift reference is per-cell, not one
    # global mean, because cells legitimately differ in spread: a batch
    # must be compared against the cells IT LANDS IN, or a
    # high-variance region admitted by one re-cluster reads as "drift"
    # against the corpus-wide mean forever (r12: found by the
    # exactly-one-rebuild actuator test).
    spark = corpus.sparkSession
    per_cell = (
        spark.read.parquet(path)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("adist").alias("m"))
        .collect()
    )
    n_rows = sum(r.n for r in per_cell)
    meta = {
        "id_col": id_col,
        "n_cells": int(n_cells),
        "dim": int(centroids.shape[1]),
        "seed": int(seed),
        "row_count": int(n_rows),
        "mean_assign_dist": float(
            sum(r.n * r.m for r in per_cell) / n_rows
        ),
        "cell_mean_assign_dist": {
            str(int(r.cell)): float(r.m) for r in per_cell
        },
        "centroids": centroids.tolist(),
    }
    write_json_sidecar(path, IVF_INDEX_META, meta, fs=fs)
    return centroids


def index_writer_lock_path(path: str) -> str:
    """The at-rest ANN index's single-WRITER mutex: the sibling
    ``<path>.compact.lock`` — deliberately the SAME sibling
    :func:`dedup._lsh_compact_lock_path` uses for the banded dedup
    indexes, so ``jobs verify-index`` holds ONE lock name and is
    serialized against every writer of every index kind (r13 ADVICE
    medium: the busy-guard took only the compact sibling while
    ``pq_append_index``/``ivf_append_bucketed`` were lock-free and
    ``rebuild_pq``/``recluster_ivf`` locked their own distinct
    siblings, leaving the transient-false-TORN / vanished-sidecar race
    open for exactly the kinds with row_count semantics). All four PQ/
    IVF writers now take this mutex FIRST (``lock_held=True`` skips
    re-acquisition for the appenders' inline actuator calls, which
    already hold it); the rebuilders' ``.rebuild.lock`` /
    ``.recluster.lock`` siblings remain as the inner recovery-
    discipline locks, always acquired AFTER this one — a fixed order,
    so no deadlock."""
    return path.rstrip("/") + ".compact.lock"


def ivf_index_verify(spark, path: str, fs=None) -> dict:
    """Check the at-rest IVF index's commit invariant: the parquet row
    count equals the sidecar's ``row_count``. A mismatch means a writer
    died between a data append and its sidecar flip (torn append — the
    extra rows' batch was never acknowledged) or foreign files landed
    in the index dir; either way probes would silently serve rows no
    commit covers, so maintenance paths call this and fail loudly.
    Returns ``{"expected", "actual", "torn"}`` — ``expected`` is None
    for a pre-r12 sidecar without the field (then ``torn`` is None
    too: unknown, not healthy; the next successful append upgrades the
    sidecar). The count is a column-pruned metadata-scale scan (parquet
    row counts come from file footers), proportional to the index's
    FILE population, never its bytes."""
    meta = read_ivf_index_meta(path, fs=fs)
    expected = meta.get("row_count")
    actual = spark.read.parquet(path).count()
    return {
        "expected": expected,
        "actual": int(actual),
        "torn": None if expected is None else (int(actual) != int(expected)),
    }


def ivf_append_bucketed(
    new_vecs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs=None,
    recluster_threshold: float | None = None,
    recluster_kwargs: dict | None = None,
    lock_held: bool = False,
) -> dict:
    """Fold NEW vectors into an at-rest IVF index without a rebuild —
    the maintenance path that closes the write→append→probe lifecycle
    (the X79 ``append_lsh_index`` analogue): each new vector is
    assigned to its nearest centroid FROM THE SIDECAR and appended into
    the matching ``cell=`` partitions (Parquet append — only touched
    cells gain files). The quantizer is deliberately NOT refit by the
    append itself: append preserves the index's cell geometry so
    existing data never moves and concurrent probes stay correct.
    Raises loudly (via :func:`read_ivf_index_meta`) rather than
    appending under unknown centroids, which would scatter vectors
    into cells probes won't look in.

    Commit protocol (r11 ADVICE — the parquet append alone is NOT
    atomic): the entry first verifies the standing index's row count
    against the sidecar (:func:`ivf_index_verify`) and raises on a
    mismatch — a torn append left by a writer killed between its data
    write and its sidecar flip (rebuild with :func:`recluster_ivf` or
    ``ivf_write_bucketed``). Then rows land, and the sidecar's
    ``row_count`` flips LAST (one atomic replace through the ``fs``
    seam) — the flip IS the commit, so a crash anywhere leaves a
    DETECTABLE state, never a silently-served one. A pre-r12 sidecar
    without the field skips the check once and gains it on this
    append's flip.

    Returns the DRIFT STATS the re-cluster decision needs: the batch's
    mean squared-L2 assignment distance against the build-time means
    OF THE CELLS THE BATCH LANDS IN (batch-count-weighted, from the
    sidecar's per-cell map — cells legitimately differ in spread, so a
    corpus-wide reference would flag every batch from a high-variance
    region forever, even one the last re-cluster deliberately
    admitted). ``drift_ratio`` ~1 means the batch still fits the
    quantizer; a ratio creeping upward across appends means the
    distribution has moved off the fitted cells (recall decays because
    true neighbors land in unprobed cells). The signal has an ACTUATOR
    (r11 verdict item 3): pass ``recluster_threshold`` and any append
    whose ratio crosses it triggers exactly one :func:`recluster_ivf`
    — quantizer refit over the index's own rows (which now include
    this batch) + atomic layout swap — before returning, with the
    rebuild's stats under ``"recluster"`` in the result; after the
    rebuild the new distribution is IN distribution, so subsequent
    batches' ratios fall back toward 1 and the trigger self-arms only
    on genuine further drift (tested with sustained OOD appends in
    tests/test_dataops.py). ``None`` (default) keeps the monitor
    signal-only for callers that schedule rebuilds themselves. The
    batch is checkpointed so the assignment kernel runs once for the
    stats AND the write.

    Single-writer mutex (r13 ADVICE): the append runs under
    :func:`index_writer_lock_path` — the sibling ``jobs verify-index``
    and every other writer of this index serialize on — so a verify
    can never observe the data-write→sidecar-flip window as a
    transient false TORN. ``lock_held=True`` skips acquisition for a
    caller that already owns the mutex (an ingest loop's writer
    thread)."""
    if not lock_held:
        from nginx_analytics_spark.operators.index_fs import LOCAL_FS

        with (fs or LOCAL_FS).exclusive_lock(
            index_writer_lock_path(path),
            "IVF appends are single-writer: a concurrent writer or "
            "verifier racing the data-write→sidecar-flip window would "
            "read a transient false TORN",
        ):
            return ivf_append_bucketed(
                new_vecs, path, id_col=id_col, vec_col=vec_col, fs=fs,
                recluster_threshold=recluster_threshold,
                recluster_kwargs=recluster_kwargs, lock_held=True,
            )
    meta = read_ivf_index_meta(path, fs=fs)
    if meta["id_col"] != id_col:
        raise ValueError(
            f"IVF index at {path!r} was built with id_col="
            f"{meta['id_col']!r}, not {id_col!r}"
        )
    spark = new_vecs.sparkSession
    check = ivf_index_verify(spark, path, fs=fs)
    if check["torn"]:
        raise ValueError(
            f"IVF index at {path!r} is torn: sidecar commits "
            f"{check['expected']} rows but {check['actual']} are on disk "
            "— a prior append died between its data write and its sidecar "
            "flip. Rebuild with recluster_ivf(...) or ivf_write_bucketed "
            "before appending (the uncommitted rows' batch was never "
            "acknowledged and must be re-sent)."
        )
    assigned = (
        new_vecs.select(F.col(id_col), as_double(vec_col).alias("cv"))
        .withColumn("a", cell_assignment(F.col("cv"), meta["centroids"]))
        .select(id_col, "cv", F.col("a.cell").alias("cell"),
                F.col("a.adist").alias("adist"))
        .localCheckpoint(eager=True)
    )
    per_cell = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("bn"), F.avg("adist").alias("bm")
    ).collect()  # <= n_cells tiny rows
    n = sum(r.bn for r in per_cell)
    batch_mean = (
        sum(r.bn * r.bm for r in per_cell) / n if n else None
    )
    assigned.write.mode("append").partitionBy("cell").parquet(path)
    # THE COMMIT: flip the sidecar's row_count after the rows are all
    # down. Everything else in the sidecar (centroids, build-time mean)
    # is append-invariant by design.
    from nginx_analytics_spark.operators.index_fs import write_json_sidecar

    committed = {
        **{k: v for k, v in meta.items() if k != "centroids"},
        "row_count": int(check["actual"]) + int(n),
        "centroids": meta["centroids"].tolist(),
    }
    write_json_sidecar(path, IVF_INDEX_META, committed, fs=fs)
    build_mean = meta.get("mean_assign_dist")
    # The drift reference is the build-time mean OF THE CELLS THE BATCH
    # LANDS IN (batch-count-weighted), falling back to the global build
    # mean for cells empty at build or a pre-r12 sidecar without the
    # per-cell map: cells legitimately differ in spread, and comparing
    # a batch against the corpus-wide mean makes every batch from a
    # high-variance region — even one a re-cluster just admitted — read
    # as drifted forever (an actuator under that monitor would rebuild
    # in a loop). ratio is None ONLY when a reference is genuinely
    # missing (empty batch / pre-drift-monitor sidecar); a ~0 reference
    # (vectors coinciding with centroids — the expansion can even read
    # tiny-negative there) clamps instead, so an out-of-distribution
    # batch against a degenerate build still fires a huge ratio rather
    # than silently suppressing the signal (r11 review).
    cell_ref = meta.get("cell_mean_assign_dist") or {}
    if batch_mean is None or (build_mean is None and not cell_ref):
        ratio = None
        expected = None
    else:
        fallback = (
            float(build_mean)
            if build_mean is not None
            else sum(cell_ref.values()) / len(cell_ref)
        )
        expected = (
            sum(
                r.bn * float(cell_ref.get(str(int(r.cell)), fallback))
                for r in per_cell
            )
            / n
        )
        ratio = float(batch_mean) / max(float(expected), 1e-12)
    out = {
        "n": int(n),
        "mean_assign_dist": float(batch_mean) if batch_mean is not None else None,
        "build_mean_assign_dist": build_mean,
        "expected_assign_dist": expected,
        "drift_ratio": ratio,
        "reclustered": False,
    }
    if (
        recluster_threshold is not None
        and ratio is not None
        and ratio > recluster_threshold
    ):
        out["recluster"] = recluster_ivf(
            spark, path, fs=fs, lock_held=True, **(recluster_kwargs or {})
        )
        out["reclustered"] = True
    return out


def _recover_ivf_recluster(path: str, fs) -> None:
    """Heal a recluster killed mid-swap, under the caller's lock. The
    swap is the X82 two-rename discipline (index → ``.old``, scratch →
    index), so a crash leaves the committed index whole in exactly one
    place: index dir present → any ``.old``/scratch leftovers are from
    a completed or never-started swap, reap them; index dir missing
    with an ``.old`` present → the crash hit between the renames, roll
    the ``.old`` back (the recluster simply didn't happen)."""
    import os

    parent, name = os.path.split(path.rstrip("/"))
    parent = parent or "."
    olds = sorted(
        d for d in fs.listdir(parent)
        if d.startswith(f".ivf-old-{name}-")
    )
    if olds and not fs.isdir(path):
        fs.rename(os.path.join(parent, olds[-1]), path)
        olds = olds[:-1]
    for d in olds:
        fs.rmtree(os.path.join(parent, d))
    for d in fs.listdir(parent):
        if d.startswith(f".ivf-scratch-{name}-"):
            fs.rmtree(os.path.join(parent, d))


def recluster_ivf(
    spark,
    path: str,
    n_cells: int | None = None,
    seed: int | None = None,
    max_iter: int = 8,
    sample_cap: int = 4096,
    fs=None,
    lock_held: bool = False,
) -> dict:
    """Re-fit the IVF quantizer over the index's OWN rows and swap the
    re-partitioned layout in atomically — the drift actuator
    :func:`ivf_append_bucketed`'s ``drift_ratio`` points at (r11
    verdict item 3: signal now has a consumer). The index stores full
    vectors per row, so the rebuild needs no external corpus handle:
    read (id, cv) through the standing layout, fit fresh centroids on
    the portable-hash sample (which now includes the drifted rows),
    and write the new cell layout to a SCRATCH dir; then the X82
    two-rename swap (index → ``.ivf-old-…``, scratch → index) makes
    the cutover one atomic rename on POSIX/HDFS, and
    :func:`_recover_ivf_recluster` — run on entry under the same
    single-recluster mutex (sibling ``<path>.recluster.lock``) — rolls
    a crashed swap back, so no crash loses the committed index. The
    swap window is not atomic for concurrent READERS (a probe racing
    the cutover can observe the missing dir and fail loudly — never
    silently wrong); run reclusters from the ingest loop's writer
    thread like X82 compaction.

    ``n_cells``/``seed`` default to the standing sidecar's, so the
    routine rebuild changes geometry, not configuration. Returns
    ``{"n_rows", "n_cells", "old_mean_assign_dist",
    "new_mean_assign_dist"}`` — the new build mean becomes the drift
    monitor's reference, which is what re-arms the trigger at ~1.

    Locking (r13 ADVICE): the GLOBAL writer mutex
    (:func:`index_writer_lock_path`) is taken first unless the caller
    already holds it (``lock_held=True`` — the inline actuator path
    from :func:`ivf_append_bucketed`); the ``.recluster.lock`` sibling
    stays as the inner recovery-discipline lock, acquired after — a
    fixed order across all writers, so no deadlock."""
    import contextlib
    import os

    from nginx_analytics_spark.operators.index_fs import LOCAL_FS

    fs = fs or LOCAL_FS
    writer_gate = (
        contextlib.nullcontext()
        if lock_held
        else fs.exclusive_lock(
            index_writer_lock_path(path),
            "recluster serializes with appends and verify-index on the "
            "index's single-writer mutex",
        )
    )
    with writer_gate, fs.exclusive_lock(
        path.rstrip("/") + ".recluster.lock",
        "recluster is single-writer by design (two concurrent swaps "
        "would interleave renames on the same index dir)",
    ):
        _recover_ivf_recluster(path, fs)
        meta = read_ivf_index_meta(path, fs=fs)
        n_cells = int(n_cells if n_cells is not None else meta["n_cells"])
        seed = int(seed if seed is not None else meta["seed"])
        rows = spark.read.parquet(path).select(meta["id_col"], "cv")
        parent, name = os.path.split(path.rstrip("/"))
        parent = parent or "."
        pid = os.getpid()
        scratch = os.path.join(parent, f".ivf-scratch-{name}-{pid}")
        ivf_write_bucketed(
            rows, scratch, n_cells=n_cells, id_col=meta["id_col"],
            vec_col="cv", seed=seed, max_iter=max_iter,
            sample_cap=sample_cap, fs=fs,
        )
        new_meta = read_ivf_index_meta(scratch, fs=fs)
        old = os.path.join(parent, f".ivf-old-{name}-{pid}")
        fs.rename(path, old)
        fs.rename(scratch, path)
        fs.rmtree(old)
        return {
            "n_rows": int(new_meta["row_count"]),
            "n_cells": n_cells,
            "old_mean_assign_dist": meta.get("mean_assign_dist"),
            "new_mean_assign_dist": new_meta.get("mean_assign_dist"),
        }


def ivf_topk_bucketed(
    spark,
    path: str,
    centroids: np.ndarray | None,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nprobe: int = 4,
    round_to: int = 6,
    fs=None,
    verify: bool = False,
) -> DataFrame:
    """Probe a bucketed-at-rest IVF index (written by
    :func:`ivf_write_bucketed`): compute the query batch's union of probe
    cells driver-side (queries are the SMALL side by contract — a top-k
    serving batch, not a second corpus), then scan the index with an
    ``IN`` partition filter so only those cells' files are opened.

    ``verify=True`` additionally checks the sidecar's ``row_count``
    commit against the on-disk rows first (:func:`ivf_index_verify`)
    and raises on a torn append — one footer-scale count per probe
    batch, for serving paths that must not read uncommitted rows. Off
    by default: appends and maintenance already gate on it, and a torn
    index only ever serves EXTRA (unacknowledged, correct-content)
    rows, never loses committed ones.

    ``centroids=None`` loads them from the index's validated sidecar —
    the normal path. Passing centroids explicitly is allowed only if
    they MATCH the sidecar (bit-equal after the json round-trip):
    foreign centroids would probe cells the corpus wasn't partitioned
    by, a silent-recall-zero bug, so the mismatch raises.

    Identical output to :func:`ivf_topk` given the same centroids — only
    the candidate-scan path differs (partition pruning vs hash join
    against an in-memory assignment).
    """
    meta = read_ivf_index_meta(path, fs=fs)
    if verify:
        check = ivf_index_verify(spark, path, fs=fs)
        if check["torn"]:
            raise ValueError(
                f"IVF index at {path!r} is torn: sidecar commits "
                f"{check['expected']} rows, disk holds {check['actual']} "
                "— rebuild with recluster_ivf/ivf_write_bucketed"
            )
    if centroids is None:
        centroids = meta["centroids"]
    elif not np.array_equal(
        np.asarray(centroids, dtype=np.float64), meta["centroids"]
    ):
        raise ValueError(
            f"IVF index at {path!r}: caller-supplied centroids disagree "
            "with the index's sidecar — the corpus is partitioned by the "
            "sidecar's cells, so probing with foreign centroids silently "
            "zeroes recall. Pass centroids=None to use the sidecar's."
        )
    qv = queries.select(F.col(query_id_col), as_double(vec_col).alias("qv"))
    # One cell-assignment pass over the query batch, materialized (the
    # batch is small by contract): both the driver-side IN filter and
    # the probe join read the checkpointed frame, instead of running
    # the nearest_cells kernel twice (r11 review).
    probes = qv.select(
        query_id_col,
        "qv",
        F.explode(nearest_cells(F.col("qv"), centroids, nprobe)).alias("cell"),
    ).localCheckpoint(eager=True)
    probe_cells = sorted(
        int(r.cell) for r in probes.select("cell").distinct().collect()
    )
    assigned = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    return _ivf_score_topk(assigned, None, centroids, k, id_col, vec_col,
                           query_id_col, nprobe, round_to, probes=probes)


# --------------------------------------------------------------------------
# Product quantization (X37) — compressed-domain ANN
# --------------------------------------------------------------------------


def _lloyd(x: np.ndarray, k: int, seed: int, iters: int) -> np.ndarray:
    """Seeded k-means (k-means++ init + Lloyd) on a driver-side sample.
    Deterministic for a given (sample, k, seed)."""
    rng = np.random.RandomState(seed)
    # k-means++ seeding
    c = [x[rng.randint(len(x))]]
    for _ in range(1, k):
        d2 = np.min(
            ((x[:, None, :] - np.stack(c)[None, :, :]) ** 2).sum(-1), axis=1
        )
        p = d2 / d2.sum() if d2.sum() > 0 else None
        c.append(x[rng.choice(len(x), p=p)])
    cents = np.stack(c)
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cents[j] = x[mask].mean(0)
    return cents


def pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    seed: int = 42,
    max_iter: int = 12,
    sample_cap: int = 20_000,
) -> np.ndarray:
    """Train product-quantization codebooks: the vector is split into
    ``m`` contiguous subspaces and each gets its own ``k``-centroid
    codebook (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011). Returns (m, k, dim/m) float64.

    The fit runs driver-side on a bounded sample (``limit(sample_cap)``
    collect — a quantizer converges on a sketch of the distribution, the
    standard practice at corpus scale; 8 distributed MLlib fits measured
    ~5s of pure scheduling overhead on the fixture for identical
    codebooks). All m subspaces fit from the ONE collected sample;
    codebooks are tiny driver constants (m*k*sub_dim doubles) shipped to
    executors in UDF closures.
    """
    rows = corpus.select(as_double(vec_col).alias("v")).limit(sample_cap).collect()
    if not rows:
        raise ValueError("empty corpus")
    x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    return _fit_books_on_sample(x, m, k, seed, max_iter)


def _fit_books_on_sample(
    x: np.ndarray, m: int, k: int, seed: int, max_iter: int
) -> np.ndarray:
    """The driver-side subspace fits shared by :func:`pq_codebooks`
    (raw vectors) and :func:`pq_write_index`'s residual mode (the same
    sample shifted by its cell centroids)."""
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = [
        _lloyd(x[:, j * sub : (j + 1) * sub], k, seed + j, max_iter)
        for j in range(m)
    ]
    return np.stack(books)  # (m, k, sub)


def _pq_encode_udf(codebooks: np.ndarray):
    """The PQ encoder as a reusable Arrow kernel: per subspace a
    (batch x k) distance matrix via matmul, argmin per row. Exposed so
    :func:`pq_write_index` can compute codes and cell assignment from
    ONE pass over the vectors instead of scanning the corpus twice."""
    books = np.ascontiguousarray(codebooks)
    m_, k_, sub = books.shape

    @F.pandas_udf("array<int>")
    def _enc(xs: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype="object")
        x = np.stack(xs.to_numpy())  # (n, dim)
        codes = np.empty((x.shape[0], m_), dtype=np.int32)
        for j in range(m_):
            xj = x[:, j * sub : (j + 1) * sub]
            c = books[j]
            d = np.einsum("ij,ij->i", c, c) - 2.0 * (xj @ c.T)
            codes[:, j] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return _enc


def _pq_encode_err_udf(codebooks: np.ndarray):
    """The encoder plus the per-row RECONSTRUCTION squared error under
    these codebooks — ``struct<codes, qerr>`` in one Arrow pass. qerr
    is what the at-rest index stores per row (the IVF index's ``adist``
    precedent): the drift monitor's reference is then a column scan of
    the index itself, never a second corpus pass. Distortion is THE
    health number for PQ — when the ingested distribution drifts off
    the fitted codebooks, qerr inflates and ADC distances degrade from
    'quantization-noisy' to 'wrong', silently."""
    books = np.ascontiguousarray(codebooks)
    m_, k_, sub = books.shape

    @F.pandas_udf("struct<codes:array<int>, qerr:double>")
    def _enc(xs: pd.Series) -> pd.DataFrame:
        if len(xs) == 0:
            return pd.DataFrame(
                {"codes": pd.Series([], dtype="object"),
                 "qerr": pd.Series([], dtype="float64")}
            )
        x = np.stack(xs.to_numpy())  # (n, dim)
        codes = np.empty((x.shape[0], m_), dtype=np.int32)
        err = np.zeros(x.shape[0], dtype=np.float64)
        for j in range(m_):
            xj = x[:, j * sub : (j + 1) * sub]
            c = books[j]
            # full |x_j - c|^2 (the encode argmin can drop the
            # row-constant |x_j|^2 term; the ERROR cannot)
            d = (
                np.einsum("ij,ij->i", c, c)[None, :]
                - 2.0 * (xj @ c.T)
                + np.einsum("ij,ij->i", xj, xj)[:, None]
            )
            idx = np.argmin(d, axis=1)
            codes[:, j] = idx
            err += d[np.arange(len(x)), idx]
        return pd.DataFrame({"codes": list(codes), "qerr": err})

    return _enc


def _pq_encode_residual_err_udf(codebooks: np.ndarray, centroids: np.ndarray):
    """The residual-mode encoder (classic IVFADC, Jégou et al. 2011
    §V.A): assign the nearest coarse cell, subtract its centroid, PQ-
    encode the RESIDUAL, and report the residual's reconstruction
    squared error — ``struct<cell, codes, qerr>`` in one Arrow pass.
    One kernel instead of composing :func:`cell_assignment` with
    :func:`_pq_encode_err_udf` because the residual DEPENDS on the
    assignment: splitting them would either ship the vector through two
    Python workers or recompute the centroid argmin. Residual encoding
    is what recovers recall at scale — residuals are smaller and more
    isotropic than raw vectors, so the same m×k codebook budget spends
    its resolution near the data instead of spanning the whole space
    (the r12 verdict's measured gap: raw-code indexed recall@5 fell
    0.56→0.48 at ×10 corpus while in-memory PQ held 0.58)."""
    books = np.ascontiguousarray(codebooks)
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    cnorm = np.einsum("ij,ij->i", cents, cents)
    m_, k_, sub = books.shape

    @F.pandas_udf("struct<cell:int, codes:array<int>, qerr:double>")
    def _enc(xs: pd.Series) -> pd.DataFrame:
        if len(xs) == 0:
            return pd.DataFrame(
                {"cell": pd.Series([], dtype="int32"),
                 "codes": pd.Series([], dtype="object"),
                 "qerr": pd.Series([], dtype="float64")}
            )
        x = np.stack(xs.to_numpy())  # (n, dim)
        part = cnorm - 2.0 * (x @ cents.T)  # |c|^2 - 2 x.c
        cell = np.argmin(part, axis=1)
        r = x - cents[cell]  # the residuals the codes reconstruct
        codes = np.empty((x.shape[0], m_), dtype=np.int32)
        err = np.zeros(x.shape[0], dtype=np.float64)
        for j in range(m_):
            rj = r[:, j * sub : (j + 1) * sub]
            c = books[j]
            d = (
                np.einsum("ij,ij->i", c, c)[None, :]
                - 2.0 * (rj @ c.T)
                + np.einsum("ij,ij->i", rj, rj)[:, None]
            )
            idx = np.argmin(d, axis=1)
            codes[:, j] = idx
            err += d[np.arange(len(x)), idx]
        return pd.DataFrame(
            {"cell": cell.astype(np.int32), "codes": list(codes), "qerr": err}
        )

    return _enc


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — each vector compressed to m codebook
    indices (m bytes at k<=256). One Arrow-batched pass
    (:func:`_pq_encode_udf`). The encoded corpus is ~dim*4/m
    bytes-per-vector smaller — the representation the 100 TB corpus is
    STORED in; raw vectors are only needed at encode time and for
    optional exact re-rank of the short list.
    """
    _enc = _pq_encode_udf(codebooks)
    return corpus.select(F.col(id_col), _enc(as_double(vec_col)).alias("codes"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    m: int = 4,
    n_codes: int = 16,
    seed: int = 42,
    round_to: int = 6,
    refine: int | None = None,
    refine_frac: float | None = 0.025,
    refine_floor: int = 50,
    refine_exact_fold: bool = False,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """Approximate L2 top-k in the COMPRESSED domain (ADC): corpus
    vectors are m-byte PQ codes; per query a (m x k) lookup table of
    query-subvector-to-centroid distances is precomputed, and each
    corpus code scores with m table gathers + a sum — no original
    vectors touched during the scan.

    The exact re-rank stage (IVFADC+R, Jégou et al. 2011 §VI) is ON BY
    DEFAULT and FRACTION-SIZED: the ADC scan keeps a shortlist of
    ``max(k, refine_floor, ceil(refine_frac * n))`` per query (n = the
    corpus count — one cheap job over the checkpointed codes), the
    shortlist joins back to the raw vectors, and exact L2 decides the
    final top-k. On data whose neighbors are separated by margins
    smaller than the quantization noise (e.g. near-random fixtures),
    pure ADC ranking saturates; re-ranking recovers it for the cost of
    shortlist-depth random vector lookups per query. ``dist`` is then
    exact squared L2, not the ADC estimate. ``refine=R`` overrides with
    an absolute depth (the pre-r11 interface — valid on clustered real
    embeddings whose margins exceed the quantization noise, where a
    constant R suffices); ``refine_frac=None`` with no ``refine``
    disables re-ranking entirely (pure ADC).

    Why fraction-sized is the default (r10 grown-fixture measurement,
    SCALING.md, re-confirmed under this default in r11): when
    quantization error dominates neighbor margins, recall tracks the
    FRACTION R/n, not the absolute depth — measured on the near-random
    unit-sphere sf0.1 fixture at 2,000 vs 20,000 vectors, the same
    R/n=2.5% gives ~the same recall@5 at both scales (0.54 and 0.58),
    a fixed R=50 falls 0.54 → 0.22 as n grows 10×, R/n=10% gives
    0.86, and R >= n gives exactly 1.00. So the default 2.5% holds
    recall flat as the corpus grows, while ``refine_floor`` keeps small
    corpora from under-refining (below 2,000 rows the floor, not the
    fraction, is binding — the fixture configuration is unchanged by
    this default). The structural-exactness tier (refine >= n) is
    ``registry_dataops.ann_pq_topk_refined``. Callers tuning the
    fraction for a new corpus should measure recall against
    :func:`brute_force_topk` on a sample first — and note the
    comparison is only meaningful on norm-consistent vectors (cosine
    and L2 rankings coincide only at unit norm; the r10 probe's first
    cut learned this the hard way).

    ``refine_exact_fold=True`` additionally makes the re-rank
    oracle-bit-exact: dist = dot(q,q) - 2*dot(q,v) + dot(v,v) with the
    deterministic sequential-fold :func:`dot` (the numpy kernel's
    pairwise summation can differ in the last ulp), rounded half-up
    BEFORE ranking so a tie at the k boundary cuts identically in both
    engines. The shortlist is tiny by contract, so the interpreted HOF
    fold costs nothing here.

    Output: (query_id, neighbor_id, dist, rank) — dist is squared L2
    (quantized approximation without refine, exact with), 6-dp rounded;
    ties break by neighbor id. Self-matches are excluded.

    Scale: the scan side reads only (id, codes); the query LUT stack is
    a broadcast constant (q x m x k doubles). The ADC pass is a narrow
    Arrow-batched map; the only shuffles are the per-query top-k window
    over candidates already cut per partition (the bounded top-k
    pattern from operators/ranking.py) and, with refine, one join of
    q*R shortlist ids against the corpus.

    ``codebooks`` injects a pre-fitted (m, k, sub) stack and skips the
    fit — the seam :func:`pq_topk_indexed`'s row-identity contract
    rests on (same codebooks in, same rows out, whichever side encoded
    the corpus); without it the fit+encode cost recurs on EVERY call,
    which is exactly what the at-rest index amortizes away.
    """
    books = (
        np.ascontiguousarray(codebooks, dtype=np.float64)
        if codebooks is not None
        else pq_codebooks(corpus, vec_col, m, n_codes, seed)
    )
    encoded = pq_encode(corpus, books, id_col, vec_col).localCheckpoint(
        eager=True  # consumed once per query batch; never re-encode
    )
    return _pq_scan_topk(
        encoded, corpus, queries, books,
        k=k, id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
        round_to=round_to, refine=refine, refine_frac=refine_frac,
        refine_floor=refine_floor, refine_exact_fold=refine_exact_fold,
    )


def _pq_scan_topk(
    encoded: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    *,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    round_to: int,
    refine: int | None,
    refine_frac: float | None,
    refine_floor: int,
    refine_exact_fold: bool,
    n_rows: int | None = None,
    qcells: dict[int, frozenset[int]] | None = None,
    q_rows: list[tuple] | None = None,
    residual_centroids: np.ndarray | None = None,
) -> DataFrame:
    """The ADC scan + optional exact re-rank shared by :func:`pq_topk`
    (which fits/encodes in-memory) and :func:`pq_topk_indexed` (which
    loads codes + codebooks from the at-rest index) — ONE scan kernel,
    so the two paths are row-identical under the same codebooks by
    construction, not by discipline. ``encoded`` carries (id, codes)
    plus a ``cell`` column when ``qcells`` or ``residual_centroids`` is
    given: the IVFADC layout's per-query cell mask (a query scores only
    candidates in ITS probed cells; the caller already partition-pruned
    the scan to the UNION of probed cells, this mask restores per-query
    semantics inside it). ``n_rows`` injects the committed corpus count
    (the sidecar's ``row_count``) so the fraction-sized refine depth
    costs no count job on the serving path.

    ``q_rows`` injects the ALREADY-COLLECTED (query_id, vector) rows so
    a caller that needed them for its own driver-side work (cell
    probing) never collects the query frame twice — a non-deterministic
    query frame (limit/sample) collected twice could disagree between
    the probe's cell map and the scan's LUTs, KeyError-ing or silently
    mis-masking (r12 ADVICE).

    ``residual_centroids`` switches the scan to RESIDUAL decoding
    (classic IVFADC, Jégou et al. 2011 §V.A): codes were encoded on
    ``v - centroid[cell]``, so the ADC distance for a candidate in cell
    c is |(q - centroid[c]) - reconstruct(codes)|² — one LUT per
    (query, cell) instead of per query, built only for cells the scan
    can actually touch (the union of probed cells; all cells when
    unpruned). The LUT stack is q × |cells touched| × m × k doubles —
    still a driver-side closure constant (queries are a serving batch
    and the touched-cell count is bounded by q·nprobe)."""
    if q_rows is None:
        q_rows = queries.select(
            F.col(query_id_col), as_double(vec_col).alias("qv")
        ).collect()
    if not q_rows:
        raise ValueError("empty query frame")
    qids = np.array([r[0] for r in q_rows])
    qv = np.stack(
        [np.asarray(r[1], dtype=np.float64) for r in q_rows]
    )  # (q, dim)
    m_, k_, sub = books.shape

    def _lut_of(qmat: np.ndarray) -> np.ndarray:
        # LUT[q, j, c] = |q_j - book[j, c]|^2
        out = np.empty((qmat.shape[0], m_, k_), dtype=np.float64)
        for j in range(m_):
            qj = qmat[:, j * sub : (j + 1) * sub]  # (q, sub)
            c = books[j]  # (k, sub)
            out[:, j, :] = (
                np.einsum("ij,ij->i", qj, qj)[:, None]
                - 2.0 * (qj @ c.T)
                + np.einsum("ij,ij->i", c, c)[None, :]
            )
        return out

    if residual_centroids is None:
        lut = _lut_of(qv)
        res_luts = None
    else:
        cents = np.ascontiguousarray(residual_centroids, dtype=np.float64)
        touched = (
            sorted({c for s in qcells.values() for c in s})
            if qcells is not None
            else range(cents.shape[0])
        )
        lut = None
        res_luts = {int(c): _lut_of(qv - cents[int(c)]) for c in touched}

    out_schema = f"{query_id_col} long, neighbor_id long, dist double"
    if refine is not None and int(refine) <= 0:
        # pre-r11 `if refine:` treated 0 as pure-ADC; silently keeping a
        # 0-deep shortlist would now return EMPTY results — fail loudly
        # and name the disable spelling instead (r11 review).
        raise ValueError(
            "refine must be a positive shortlist depth; for a pure ADC "
            "scan pass refine_frac=None (and no refine)"
        )
    if refine is not None:
        depth = int(refine)
    elif refine_frac is not None:
        import math

        n_corpus = n_rows if n_rows is not None else encoded.count()
        depth = max(k, refine_floor, math.ceil(refine_frac * n_corpus))
    else:
        depth = k
    do_refine = refine is not None or refine_frac is not None
    # per-query allowed-cell arrays, precomputed once (np.isin per batch
    # row-group is the kernel-side cost; the dict itself is a tiny
    # broadcast closure constant — queries are a serving batch)
    qallow = (
        {int(qid): np.fromiter(qcells[int(qid)], dtype=np.int64)
         for qid in qids}
        if qcells is not None
        else None
    )

    need_cells = qallow is not None or res_luts is not None

    def _adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # (n, m)
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy() if need_cells else None
            # dist (q, n): gather LUT per subspace, accumulate
            d = np.zeros((len(qids), len(ids)), dtype=np.float64)
            if res_luts is not None:
                # residual decoding: each candidate's LUT is its CELL's
                # (codes reconstruct v - centroid[cell]); group the
                # batch's columns by cell and gather per group
                for c in np.unique(cells):
                    cols = np.nonzero(cells == c)[0]
                    lut_c = res_luts[int(c)]
                    for j in range(m_):
                        d[:, cols] += lut_c[:, j, :][:, codes[cols, j]]
            else:
                for j in range(m_):
                    d += lut[:, j, :][:, codes[:, j]]
            rows = []
            for qi, qid in enumerate(qids):
                mask = ids != qid  # exclude self
                if qallow is not None:
                    mask &= np.isin(cells, qallow[int(qid)])
                di, ii = d[qi][mask], ids[mask]
                # lexsort on (dist, neighbor_id): a dist tie at the depth
                # boundary must cut the same neighbor regardless of the
                # partition's row order, matching the bounded top-k
                # pattern's determinism contract (the global window below
                # orders by (dist, neighbor_id) but cannot recover a
                # candidate already dropped per partition).
                top = np.lexsort((ii, di))[:depth]
                rows.append(
                    pd.DataFrame(
                        {
                            query_id_col: qid,
                            "neighbor_id": ii[top],
                            "dist": di[top],
                        }
                    )
                )
            yield pd.concat(rows, ignore_index=True)

    # per-partition shortlist per query, then one tiny global window
    cands = encoded.mapInPandas(_adc, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    if do_refine:
        shortlist = (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= depth)
            .select(query_id_col, "neighbor_id")
        )
        vecs = corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("nv")
        )
        if refine_exact_fold:
            qframe = queries.select(
                F.col(query_id_col), as_double(vec_col).alias("_qv")
            )
            nv, qvc = F.col("nv"), F.col("_qv")
            exact = dot(qvc, qvc) - 2 * dot(qvc, nv) + dot(nv, nv)
            cands = (
                shortlist.join(vecs, "neighbor_id")
                .join(F.broadcast(qframe), query_id_col)
                .select(
                    query_id_col,
                    "neighbor_id",
                    half_up(exact, round_to).alias("dist"),
                )
            )
        else:
            qmap = {int(qid): qv[i] for i, qid in enumerate(qids)}

            @F.pandas_udf("double")
            def _exact_l2(qs: pd.Series, vs: pd.Series) -> pd.Series:
                if len(qs) == 0:
                    return pd.Series([], dtype="float64")
                qm = np.stack([qmap[int(q)] for q in qs.to_numpy()])
                v = np.stack(vs.to_numpy())
                diff = qm - v
                return pd.Series(np.einsum("ij,ij->i", diff, diff))

            cands = shortlist.join(vecs, "neighbor_id").select(
                query_id_col,
                "neighbor_id",
                _exact_l2(F.col(query_id_col), F.col("nv")).alias("dist"),
            )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            half_up(F.col("dist"), round_to).alias("dist"),
            "rank",
        )
    )


PQ_INDEX_META = "_pq_meta.json"


def pq_index_meta_path(path: str) -> str:
    return f"{path.rstrip('/')}/{PQ_INDEX_META}"


def read_pq_index_meta(path: str, fs=None) -> dict:
    """Load the at-rest PQ index's sidecar — the fitted codebooks (and,
    for the IVFADC layout, the coarse centroids) plus the parameters
    they were fitted under — with both arrays validated and converted
    to float64 (json float repr round-trips float64 exactly, the
    ``_ivf_meta.json`` precedent). Raises FileNotFoundError for a
    pre-sidecar (or foreign) directory and ValueError for a corrupt
    one: scoring codes against codebooks they were not ENCODED under
    returns confidently wrong distances — worse than the LSH/IVF
    failure modes (which lose recall), this one corrupts the ranking
    itself, so the guard is just as loud."""
    from nginx_analytics_spark.operators.index_fs import read_json_sidecar

    meta = read_json_sidecar(path, PQ_INDEX_META, fs=fs)
    books = np.asarray(meta.get("codebooks"), dtype=np.float64)
    m, k, sub = meta.get("m"), meta.get("n_codes"), meta.get("sub")
    if books.ndim != 3 or books.shape != (m, k, sub):
        raise ValueError(
            f"PQ index at {path!r}: sidecar codebooks shape {books.shape} "
            f"disagrees with its own (m, n_codes, sub) = ({m}, {k}, {sub}) "
            "— rebuild with pq_write_index"
        )
    if meta.get("dim") != m * sub:
        raise ValueError(
            f"PQ index at {path!r}: sidecar dim {meta.get('dim')} != "
            f"m*sub = {m * sub} — rebuild with pq_write_index"
        )
    meta["codebooks"] = books
    if meta.get("n_cells") is not None:
        cents = np.asarray(meta.get("centroids"), dtype=np.float64)
        if cents.ndim != 2 or cents.shape != (meta["n_cells"], meta["dim"]):
            raise ValueError(
                f"PQ index at {path!r}: sidecar centroids shape "
                f"{cents.shape} disagrees with its own (n_cells, dim) = "
                f"({meta.get('n_cells')}, {meta.get('dim')}) — rebuild "
                "with pq_write_index"
            )
        meta["centroids"] = cents
    return meta


def pq_write_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    n_codes: int = 16,
    seed: int = 42,
    max_iter: int = 12,
    sample_cap: int = 20_000,
    n_cells: int | None = None,
    ivf_max_iter: int = 8,
    ivf_sample_cap: int = 4096,
    residual: bool = False,
    fs=None,
) -> np.ndarray:
    """Materialize the PQ-compressed corpus AT REST so the fit+encode
    cost is paid ONCE, not per serving call (the r11 verdict's last
    ANN gap: :func:`pq_topk` re-fits codebooks and re-encodes the
    corpus on every invocation — fine for a batch analytic, wrong for
    a serving path). Two layouts:

      * ``n_cells=None`` (flat): (id, codes) parquet — the plain
        compressed-domain scan, every probe reads all codes but only
        ~dim*4/m bytes per vector;
      * ``n_cells=N`` (IVFADC, Jégou et al. 2011 §V): the IVF coarse
        quantizer (:func:`ivf_centroids` — layout-invariant fit)
        assigns each row a cell and the codes land PARTITIONED BY
        ``cell``, so a probe is partition pruning first (only
        nprobe/n_cells of the code files are opened) and an m-byte ADC
        scan second — the two pruning axes compose: at 100 TB the scan
        touches nprobe/n_cells of the files at 1/(dim*4/m)-th the
        bytes. By default codes quantize the RAW vectors, not cell
        residuals: that keeps codes cell-independent, so the flat and
        celled layouts share one encoder, one query LUT (computed once
        per query, not once per probed cell), and the row-identity
        contract with :func:`pq_topk`.

    ``residual=True`` (celled layout only — it raises on flat, there
    is no cell to take a residual against) opts into TRUE IVFADC
    encoding (Jégou et al. 2011 §V.A): codebooks are fitted on the
    sample's CELL RESIDUALS and each row's codes reconstruct
    ``v - centroid[cell]``. Residuals are smaller and more isotropic
    than raw vectors, so the same m×k budget resolves finer structure
    — the standard recall recovery at grown scale (the r12 verdict's
    measured gap: raw-code indexed recall@5 fell 0.56→0.48 at ×10
    corpus while in-memory PQ held 0.58; the residual-vs-raw table
    lives in SCALING.md r13). The price is DELIBERATE: residual codes
    are cell-dependent, so the probe builds one LUT per (query,
    touched cell) and the output is no longer row-identical to
    :func:`pq_topk`'s raw encoding — the raw mode keeps that identity
    contract, this mode keeps recall; the sidecar records which was
    built and :func:`pq_topk_indexed` decodes accordingly.

    WHY THE DEFAULT STAYS ``residual=False`` (r13 verdict item 6 — a
    deliberate, measured decision, pinned by test): the SCALING.md r13
    table shows residual WINS where the index has outgrown its
    refine floor (×10 grown fixture: recall@5 0.62 vs 0.50 at
    identical m/nprobe) but LOSES at the 2,000-row base (0.52 vs 0.56)
    where ``refine_floor=50`` already re-ranks a quarter of the corpus
    exactly and the extra LUT-per-cell work buys nothing — small and
    medium indexes are refine-floor-dominated, and a new index is
    small by definition. Raw is also the only encoding that holds the
    row-identity contract with :func:`pq_topk` (the exactness tier the
    driver hash-checks). The migration is one command when a corpus
    outgrows the floor: ``jobs rebuild-pq --residual`` (or the inline
    ``rebuild_threshold`` actuator with ``residual=True`` in
    ``rebuild_kwargs``), and ``jobs tune-ann`` re-measures the
    nprobe/recall point on the rebuilt index.

    The ``_pq_meta.json`` sidecar carries the codebooks (and centroids,
    when celled) bit-faithfully plus a ``row_count`` written LAST —
    the flip is the commit, exactly the :func:`ivf_write_bucketed`
    protocol, so a torn write is detectable by
    :func:`pq_index_verify` / a ``verify=True`` probe. Each row also
    stores its reconstruction squared error ``qerr`` under the fitted
    codebooks (the IVF ``adist`` precedent), and the sidecar records
    the build-time mean distortion (per cell when celled — cells
    legitimately differ in spread) — :func:`pq_append_index`'s drift
    monitor compares incoming batches against it. Probes never read
    the column (explicit column selection keeps the scan at
    (id, codes)). Seam scope matches the IVF index (documented there,
    r11 ADVICE): ``fs`` covers sidecar I/O only; row I/O is Spark
    parquet. Returns the fitted codebooks for callers that probe
    immediately."""
    from nginx_analytics_spark.operators.index_fs import write_json_sidecar

    if residual and n_cells is None:
        raise ValueError(
            "residual=True needs a cell layout (n_cells) — residual "
            "codes reconstruct v - centroid[cell], so a flat index has "
            "nothing to take the residual against"
        )
    centroids = None
    v = corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
    if n_cells is None:
        books = pq_codebooks(
            corpus, vec_col, m, n_codes, seed, max_iter, sample_cap
        )
        enc = _pq_encode_err_udf(books)
        v.select(
            id_col,
            enc(F.col("v")).alias("e"),
        ).select(
            id_col, F.col("e.codes").alias("codes"),
            F.col("e.qerr").alias("qerr"),
        ).write.mode("overwrite").parquet(path)
    else:
        centroids = ivf_centroids(
            corpus, n_cells, vec_col, seed, ivf_max_iter, id_col,
            ivf_sample_cap,
        )
        if residual:
            # fit the codebooks on the SAMPLE'S residuals — one bounded
            # collect (the pq_codebooks contract), shifted driver-side
            # by each row's nearest centroid before the subspace fits
            rows = (
                v.select("v").limit(sample_cap).collect()
            )
            if not rows:
                raise ValueError("empty corpus")
            x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
            part = (
                np.einsum("ij,ij->i", centroids, centroids)
                - 2.0 * (x @ centroids.T)
            )
            x = x - centroids[np.argmin(part, axis=1)]
            books = _fit_books_on_sample(x, m, n_codes, seed, max_iter)
            enc = _pq_encode_residual_err_udf(books, centroids)
            v.select(
                id_col,
                enc(F.col("v")).alias("e"),
            ).select(
                id_col, F.col("e.codes").alias("codes"),
                F.col("e.qerr").alias("qerr"),
                F.col("e.cell").alias("cell"),
            ).write.mode("overwrite").partitionBy("cell").parquet(path)
        else:
            books = pq_codebooks(
                corpus, vec_col, m, n_codes, seed, max_iter, sample_cap
            )
            enc = _pq_encode_err_udf(books)
            v.select(
                id_col,
                enc(F.col("v")).alias("e"),
                cell_assignment(F.col("v"), centroids)["cell"].alias("cell"),
            ).select(
                id_col, F.col("e.codes").alias("codes"),
                F.col("e.qerr").alias("qerr"), "cell",
            ).write.mode("overwrite").partitionBy("cell").parquet(path)
    # Build-time distortion reference from the written index's qerr
    # column — a column-pruned re-read (per cell when celled), not a
    # second pass over the vectors (the ivf_write_bucketed pattern).
    spark = corpus.sparkSession
    written = spark.read.parquet(path)
    if n_cells is None:
        agg = written.agg(
            F.count(F.lit(1)).alias("n"), F.avg("qerr").alias("q")
        ).collect()[0]
        n_rows, mean_q, cell_q = int(agg.n), float(agg.q), None
    else:
        per_cell = (
            written.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"), F.avg("qerr").alias("q"))
            .collect()
        )
        n_rows = sum(r.n for r in per_cell)
        mean_q = float(sum(r.n * r.q for r in per_cell) / n_rows)
        cell_q = {str(int(r.cell)): float(r.q) for r in per_cell}
    meta = {
        "id_col": id_col,
        "m": int(m),
        "n_codes": int(n_codes),
        "dim": int(books.shape[0] * books.shape[2]),
        "sub": int(books.shape[2]),
        "seed": int(seed),
        "row_count": int(n_rows),
        "mean_quant_err": mean_q,
        "cell_mean_quant_err": cell_q,
        "n_cells": None if n_cells is None else int(n_cells),
        "residual": bool(residual),
        "centroids": None if centroids is None else centroids.tolist(),
        "codebooks": books.tolist(),
    }
    write_json_sidecar(path, PQ_INDEX_META, meta, fs=fs)
    return books


def pq_append_index(
    new_vecs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rebuild_threshold: float | None = None,
    rebuild_corpus: DataFrame | None = None,
    rebuild_kwargs: dict | None = None,
    fs=None,
    lock_held: bool = False,
) -> dict:
    """Fold NEW vectors into an at-rest PQ index without a rebuild —
    the maintenance path that closes the write→append→probe lifecycle
    for the compressed-domain index (the ``ivf_append_bucketed`` /
    ``append_srp_index`` analogue): each new vector is encoded under
    the SIDECAR's codebooks (never a refit — refitting would silently
    re-key the standing corpus's codes) and, on the IVFADC layout,
    assigned to its nearest sidecar centroid, then appended into the
    matching partitions. Same commit protocol as the IVF append (r11
    ADVICE lineage): the entry verifies the standing ``row_count``
    first and raises on a torn predecessor; rows land; the sidecar's
    count flips LAST — the flip is the commit.

    Returns DRIFT STATS in distortion space — the PQ-native health
    signal: the batch's mean reconstruction squared error under the
    standing codebooks against the build-time mean of the cells the
    batch lands in (count-weighted; global mean on the flat layout).
    ``drift_ratio`` ~1 means the codebooks still describe the incoming
    distribution; a ratio creeping upward means ADC distances are
    degrading from quantization-noisy to WRONG for new rows. Unlike
    the IVF monitor this one has no IN-PLACE actuator BY CONSTRUCTION:
    a codebook refit needs raw vectors, and the PQ index deliberately
    stores only m-byte codes — an index that stored its own raw
    vectors to enable self-rebuild would forfeit the 8x compression
    that is its entire point. The actuator the ratio points at is
    :func:`rebuild_pq` (CLI ``jobs rebuild-pq``, r13): refit from the
    RAW corpus store the caller owns and swap atomically under the
    recluster crash discipline — after it, in-distribution appends
    read ~1 again.

    The signal can also drive the actuator INLINE, completing the IVF
    append's ``recluster_threshold`` symmetry: pass
    ``rebuild_threshold`` together with ``rebuild_corpus`` (the raw
    corpus frame — it must already INCLUDE this batch's rows, i.e. the
    caller appends to its corpus store before or alongside the index,
    which both ingest loops do) and any append whose drift_ratio
    crosses the threshold triggers exactly one :func:`rebuild_pq`
    after its own commit, returning the rebuild's stats under
    ``"rebuild"`` with ``"rebuilt": True``. ``rebuild_threshold``
    WITHOUT a corpus raises immediately — a trigger that could never
    fire its actuator would be worse than no trigger (the misconfig
    would surface only once drift is already real). The "corpus
    already includes this batch" requirement is ENFORCED, not just
    documented (r13 ADVICE): the rebuilt sidecar's ``row_count`` must
    cover what this append just committed, else the inline rebuild
    raises — a stale corpus frame would otherwise silently drop the
    acknowledged batch from the rebuilt index."""
    if rebuild_threshold is not None and rebuild_corpus is None:
        raise ValueError(
            "rebuild_threshold needs rebuild_corpus: the PQ index "
            "stores only m-byte codes, so the inline rebuild must be "
            "handed the raw corpus frame (including this batch's rows)"
        )
    if not lock_held:
        # r13 ADVICE: appends serialize on the index's single-writer
        # mutex (the same sibling verify-index takes) so a verifier can
        # never observe the data-write→sidecar-flip window as TORN.
        from nginx_analytics_spark.operators.index_fs import LOCAL_FS

        with (fs or LOCAL_FS).exclusive_lock(
            index_writer_lock_path(path),
            "PQ appends are single-writer: a concurrent writer or "
            "verifier racing the data-write→sidecar-flip window would "
            "read a transient false TORN",
        ):
            return pq_append_index(
                new_vecs, path, id_col=id_col, vec_col=vec_col,
                rebuild_threshold=rebuild_threshold,
                rebuild_corpus=rebuild_corpus,
                rebuild_kwargs=rebuild_kwargs, fs=fs, lock_held=True,
            )
    meta = read_pq_index_meta(path, fs=fs)
    if meta["id_col"] != id_col:
        raise ValueError(
            f"PQ index at {path!r} was built with id_col="
            f"{meta['id_col']!r}, not {id_col!r}"
        )
    spark = new_vecs.sparkSession
    check = pq_index_verify(spark, path, fs=fs)
    if check["torn"]:
        raise ValueError(
            f"PQ index at {path!r} is torn: sidecar commits "
            f"{check['expected']} rows but {check['actual']} are on disk "
            "— a prior append died between its data write and its "
            "sidecar flip. Rebuild with pq_write_index before appending "
            "(the uncommitted rows' batch was never acknowledged and "
            "must be re-sent)."
        )
    v = new_vecs.select(F.col(id_col), as_double(vec_col).alias("v"))
    celled = meta.get("n_cells") is not None
    if celled:
        if meta.get("residual"):
            # a residual index appends residual codes — encoding a new
            # row's RAW vector against residual-fitted codebooks would
            # silently poison its distances (and inflate its qerr into
            # a phantom drift signal)
            enc = _pq_encode_residual_err_udf(
                meta["codebooks"], meta["centroids"]
            )
            assigned = v.select(
                id_col, enc(F.col("v")).alias("e")
            ).select(
                id_col, F.col("e.codes").alias("codes"),
                F.col("e.qerr").alias("qerr"),
                F.col("e.cell").alias("cell"),
            ).localCheckpoint(eager=True)
        else:
            enc = _pq_encode_err_udf(meta["codebooks"])
            assigned = v.select(
                id_col,
                enc(F.col("v")).alias("e"),
                cell_assignment(F.col("v"), meta["centroids"])["cell"].alias(
                    "cell"
                ),
            ).select(
                id_col, F.col("e.codes").alias("codes"),
                F.col("e.qerr").alias("qerr"), "cell",
            ).localCheckpoint(eager=True)  # stats agg + write, one encode
        per_cell = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("bn"), F.avg("qerr").alias("bq")
        ).collect()
        n = sum(r.bn for r in per_cell)
        batch_mean = (
            float(sum(r.bn * r.bq for r in per_cell) / n) if n else None
        )
        cell_ref = meta.get("cell_mean_quant_err") or {}
        fallback = meta.get("mean_quant_err")
        expected = (
            float(
                sum(
                    r.bn * float(cell_ref.get(str(int(r.cell)), fallback))
                    for r in per_cell
                )
                / n
            )
            if n and fallback is not None
            else None
        )
        assigned.write.mode("append").partitionBy("cell").parquet(path)
    else:
        enc = _pq_encode_err_udf(meta["codebooks"])
        assigned = v.select(
            id_col, enc(F.col("v")).alias("e")
        ).select(
            id_col, F.col("e.codes").alias("codes"),
            F.col("e.qerr").alias("qerr"),
        ).localCheckpoint(eager=True)
        agg = assigned.agg(
            F.count(F.lit(1)).alias("n"), F.avg("qerr").alias("q")
        ).collect()[0]
        n = int(agg.n)
        batch_mean = float(agg.q) if n else None
        expected = meta.get("mean_quant_err") if n else None
        assigned.write.mode("append").parquet(path)
    # THE COMMIT: flip the sidecar's row_count after the rows are down.
    # Codebooks/centroids/build-time distortion are append-invariant.
    from nginx_analytics_spark.operators.index_fs import write_json_sidecar

    committed = {
        **{k: v for k, v in meta.items() if k not in ("codebooks", "centroids")},
        "row_count": int(check["actual"]) + int(n),
        "codebooks": meta["codebooks"].tolist(),
        "centroids": (
            None if meta.get("n_cells") is None
            else meta["centroids"].tolist()
        ),
    }
    write_json_sidecar(path, PQ_INDEX_META, committed, fs=fs)
    ratio = (
        float(batch_mean) / max(float(expected), 1e-12)
        if batch_mean is not None and expected is not None
        else None
    )
    out = {
        "n": int(n),
        "mean_quant_err": batch_mean,
        "expected_quant_err": expected,
        "drift_ratio": ratio,
        "rebuilt": False,
    }
    if (
        rebuild_threshold is not None
        and ratio is not None
        and ratio > rebuild_threshold
    ):
        # r13 ADVICE: "rebuild_corpus already includes this batch's
        # rows" was a docs-only contract — a caller handing a STALE
        # corpus frame silently dropped the just-committed batch from
        # the rebuilt index. r14 ADVICE tightened WHERE the guard
        # fires: counting after the rebuild raised loudly but only
        # AFTER the shrunken index had been atomically swapped in —
        # the on-disk index was already missing acknowledged rows the
        # moment the exception surfaced. So the corpus is counted
        # FIRST (one footer-scale count of the frame the rebuild is
        # about to scan anyway) and a stale frame is refused while the
        # complete, just-committed index is still in place.
        pre = int(committed["row_count"])
        corpus_n = int(rebuild_corpus.count())
        if corpus_n < pre:
            raise ValueError(
                f"refusing inline rebuild of the PQ index at {path!r}: "
                f"the append just committed {pre} rows but "
                f"rebuild_corpus holds only {corpus_n} — the corpus "
                "frame is stale (it must already include this batch's "
                "rows; both ingest loops append to their corpus store "
                "before or alongside the index). The committed index "
                "is intact; re-run the rebuild from the complete "
                "corpus store."
            )
        out["rebuild"] = rebuild_pq(
            new_vecs.sparkSession, rebuild_corpus, path,
            vec_col=vec_col, fs=fs, lock_held=True,
            **(rebuild_kwargs or {}),
        )
        out["rebuilt"] = True
        # Backstop (should be unreachable given the pre-count): if the
        # build itself dropped rows, still fail loudly rather than
        # hand back a silently-shrunken index.
        post = int(out["rebuild"]["n_rows"])
        if post < pre:
            raise ValueError(
                f"inline rebuild of the PQ index at {path!r} SHRANK it: "
                f"the append committed {pre} rows but the rebuild wrote "
                f"only {post} — the rebuilt index is missing "
                "acknowledged rows; re-rebuild from the complete corpus "
                "store."
            )
    return out


def pq_index_verify(spark, path: str, fs=None) -> dict:
    """The :func:`ivf_index_verify` twin for the PQ index: parquet row
    count vs the sidecar's ``row_count`` commit. Returns
    ``{"expected", "actual", "torn"}`` (footer-scale scan)."""
    meta = read_pq_index_meta(path, fs=fs)
    expected = meta.get("row_count")
    actual = spark.read.parquet(path).count()
    return {
        "expected": expected,
        "actual": int(actual),
        "torn": None if expected is None else (int(actual) != int(expected)),
    }


def _recover_pq_rebuild(path: str, fs) -> None:
    """Heal a :func:`rebuild_pq` killed mid-swap, under the caller's
    lock — the :func:`_recover_ivf_recluster` discipline verbatim with
    the PQ scratch/old prefixes: index dir present → leftovers are from
    a completed or never-started swap, reap them; index dir missing
    with an ``.old`` present → the crash hit between the two renames,
    roll the ``.old`` back (the rebuild simply didn't happen)."""
    import os

    parent, name = os.path.split(path.rstrip("/"))
    parent = parent or "."
    olds = sorted(
        d for d in fs.listdir(parent)
        if d.startswith(f".pq-old-{name}-")
    )
    if olds and not fs.isdir(path):
        fs.rename(os.path.join(parent, olds[-1]), path)
        olds = olds[:-1]
    for d in olds:
        fs.rmtree(os.path.join(parent, d))
    for d in fs.listdir(parent):
        if d.startswith(f".pq-scratch-{name}-"):
            fs.rmtree(os.path.join(parent, d))


def rebuild_pq(
    spark,
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    m: int | None = None,
    n_codes: int | None = None,
    seed: int | None = None,
    max_iter: int = 12,
    sample_cap: int = 20_000,
    n_cells: int | None = None,
    residual: bool | None = None,
    ivf_max_iter: int = 8,
    ivf_sample_cap: int = 4096,
    fs=None,
    lock_held: bool = False,
) -> dict:
    """Refit an at-rest PQ index from the RAW corpus and swap the new
    layout in atomically — the rebuild entry point the PQ drift monitor
    points at (r12 verdict item 4: :func:`pq_append_index`'s
    ``drift_ratio`` had no CLI-reachable actuator; the docstring's
    "rebuild belongs to the corpus-store owner" was honest but left the
    operator runbook at a Python API). Unlike :func:`recluster_ivf` the
    index CANNOT rebuild from its own rows — it stores m-byte codes,
    deliberately (self-rebuildability would forfeit the compression
    that is its point) — so the caller supplies the corpus of raw
    vectors (the ingest loop's corpus store via
    ``streaming.dedup_ingest.read_corpus``; the ``jobs rebuild-pq``
    CLI wires exactly that).

    Configuration (``m``/``n_codes``/``seed``/``n_cells``/``residual``)
    defaults to the standing sidecar's, so the routine rebuild changes
    codebooks, not geometry; ``id_col`` always carries over (the probe
    contract). The swap is the X82 two-rename discipline under the
    sibling ``<path>.rebuild.lock`` single-rebuilder mutex, healed on
    entry by :func:`_recover_pq_rebuild` — a crash never loses the
    committed index, and a probe racing the cutover fails loudly,
    never silently wrong (the :func:`recluster_ivf` caveat verbatim).
    Returns ``{"n_rows", "n_cells", "residual",
    "old_mean_quant_err", "new_mean_quant_err"}`` — the new build mean
    becomes the drift monitor's reference, which re-arms the trigger
    at ~1 for in-distribution appends.

    Locking (r13 ADVICE): the GLOBAL writer mutex
    (:func:`index_writer_lock_path`) is taken first unless the caller
    already holds it (``lock_held=True`` — the inline actuator path
    from :func:`pq_append_index`); the ``.rebuild.lock`` sibling stays
    as the inner recovery-discipline lock, acquired after — a fixed
    order across all writers, so no deadlock."""
    import contextlib
    import os

    from nginx_analytics_spark.operators.index_fs import LOCAL_FS

    fs = fs or LOCAL_FS
    writer_gate = (
        contextlib.nullcontext()
        if lock_held
        else fs.exclusive_lock(
            index_writer_lock_path(path),
            "rebuild-pq serializes with appends and verify-index on "
            "the index's single-writer mutex",
        )
    )
    with writer_gate, fs.exclusive_lock(
        path.rstrip("/") + ".rebuild.lock",
        "rebuild-pq is single-writer by design (two concurrent swaps "
        "would interleave renames on the same index dir)",
    ):
        _recover_pq_rebuild(path, fs)
        meta = read_pq_index_meta(path, fs=fs)
        m = int(m if m is not None else meta["m"])
        n_codes = int(n_codes if n_codes is not None else meta["n_codes"])
        seed = int(seed if seed is not None else meta["seed"])
        if n_cells is None:
            n_cells = meta.get("n_cells")
        if residual is None:
            residual = bool(meta.get("residual"))
        parent, name = os.path.split(path.rstrip("/"))
        parent = parent or "."
        pid = os.getpid()
        scratch = os.path.join(parent, f".pq-scratch-{name}-{pid}")
        pq_write_index(
            corpus, scratch, id_col=meta["id_col"], vec_col=vec_col,
            m=m, n_codes=n_codes, seed=seed, max_iter=max_iter,
            sample_cap=sample_cap, n_cells=n_cells,
            ivf_max_iter=ivf_max_iter, ivf_sample_cap=ivf_sample_cap,
            residual=residual, fs=fs,
        )
        new_meta = read_pq_index_meta(scratch, fs=fs)
        old = os.path.join(parent, f".pq-old-{name}-{pid}")
        fs.rename(path, old)
        fs.rename(scratch, path)
        fs.rmtree(old)
        return {
            "n_rows": int(new_meta["row_count"]),
            "n_cells": new_meta.get("n_cells"),
            "residual": bool(new_meta.get("residual")),
            "old_mean_quant_err": meta.get("mean_quant_err"),
            "new_mean_quant_err": new_meta.get("mean_quant_err"),
        }


def pq_topk_indexed(
    spark,
    corpus: DataFrame,
    queries: DataFrame,
    path: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nprobe: int | None = None,
    round_to: int = 6,
    refine: int | None = None,
    refine_frac: float | None = 0.025,
    refine_floor: int = 50,
    refine_exact_fold: bool = False,
    verify: bool = False,
    fs=None,
) -> DataFrame:
    """Probe an at-rest PQ index (written by :func:`pq_write_index`):
    codebooks load from the validated sidecar and codes from parquet —
    NO fit, NO corpus encode; the per-call cost is the LUT build
    (driver-side, q x m x k doubles) plus the compressed-domain scan.
    Under the same codebooks the output is row-identical to
    :func:`pq_topk` BY CONSTRUCTION — both run :func:`_pq_scan_topk`
    (pinned by tests/test_dataops.py).

    ``nprobe`` (IVFADC layout only) prunes the scan to each query's
    nprobe nearest cells: the union of probed cells becomes an ``IN``
    partition filter (only those cells' files are OPENED — the
    ``ivf_topk_bucketed`` discipline), and inside the pruned scan each
    query scores only its OWN probed cells' candidates via the kernel's
    per-query mask. ``nprobe=None`` on a celled index scans every cell
    (the flat semantics — identical output to a flat index under the
    same codebooks); ``nprobe`` on a FLAT index raises (there are no
    cells to prune — rebuild with ``n_cells``).

    ``corpus`` supplies raw vectors for the exact re-rank stage only
    (IVFADC+R — the shortlist join; pass ``refine_frac=None`` for pure
    ADC and the corpus frame goes untouched). The refine depth uses the
    sidecar's committed ``row_count``, so the serving path runs zero
    count jobs. ``verify=True`` gates on :func:`pq_index_verify` first
    and raises on a torn write.

    The query frame is collected exactly ONCE (r12 ADVICE): the probed
    cells are computed driver-side from the same collected rows the
    scan's LUTs use, so a non-deterministic query frame (limit/sample)
    cannot disagree between the cell map and the mask. A RESIDUAL index
    (``pq_write_index(residual=True)``) is detected from the sidecar
    and decoded accordingly — see :func:`_pq_scan_topk`; its output is
    NOT row-identical to :func:`pq_topk` (which encodes raw vectors by
    contract), it trades that identity for the classic IVFADC recall
    recovery at scale."""
    meta = read_pq_index_meta(path, fs=fs)
    if id_col != meta["id_col"]:
        raise ValueError(
            f"PQ index at {path!r} stores ids in column "
            f"{meta['id_col']!r}, not {id_col!r} — probe with the "
            "index's id_col or rebuild"
        )
    if verify:
        check = pq_index_verify(spark, path, fs=fs)
        if check["torn"]:
            raise ValueError(
                f"PQ index at {path!r} is torn: sidecar commits "
                f"{check['expected']} rows, disk holds {check['actual']} "
                "— rebuild with pq_write_index"
            )
    books = meta["codebooks"]
    residual = bool(meta.get("residual"))
    encoded = spark.read.parquet(path)
    # ONE collect of the query frame — shared by the driver-side cell
    # probe below and the scan kernel's LUTs (r12 ADVICE: two collects
    # of a non-deterministic frame can disagree).
    q_rows = queries.select(
        F.col(query_id_col), as_double(vec_col).alias("qv")
    ).collect()
    qcells = None
    if nprobe is not None:
        if meta.get("n_cells") is None:
            raise ValueError(
                f"PQ index at {path!r} is flat (no cell layout) — "
                "nprobe has nothing to prune; rebuild with "
                "pq_write_index(n_cells=...) for IVFADC probing"
            )
        if q_rows:
            # same argmin decisions as nearest_cells (stable argsort of
            # |c|^2 - 2 x.c — the |x|^2 term is row-constant), run on
            # the already-collected rows instead of a second Spark job
            cents = meta["centroids"]
            cnorm = np.einsum("ij,ij->i", cents, cents)
            x = np.stack(
                [np.asarray(r[1], dtype=np.float64) for r in q_rows]
            )
            dcell = cnorm - 2.0 * (x @ cents.T)
            order = np.argsort(dcell, axis=1, kind="stable")[:, : int(nprobe)]
            qcells = {
                int(r[0]): frozenset(int(c) for c in order[i])
                for i, r in enumerate(q_rows)
            }
            union = sorted({c for s in qcells.values() for c in s})
            encoded = encoded.filter(F.col("cell").isin(union))
        encoded = encoded.select(id_col, "codes", "cell")
    elif residual:
        # residual decoding needs each candidate's cell even unpruned
        encoded = encoded.select(id_col, "codes", "cell")
    else:
        encoded = encoded.select(id_col, "codes")
    return _pq_scan_topk(
        encoded, corpus, queries, books,
        k=k, id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
        round_to=round_to, refine=refine, refine_frac=refine_frac,
        refine_floor=refine_floor, refine_exact_fold=refine_exact_fold,
        n_rows=meta["row_count"], qcells=qcells, q_rows=q_rows,
        residual_centroids=meta["centroids"] if residual else None,
    )


def label_centroids(
    emb: DataFrame,
    group: str = "label",
    vec: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-group embedding centroids as (group, dim, centroid) rows —
    the summary a curation pipeline needs for domain drift monitoring,
    cluster-balanced sampling, and semantic-dedup seeding (and the
    training step of the IVF coarse quantizer, expressed relationally).

    posexplode unpivots each vector to (dim, value) pairs that partial-
    aggregate map-side — the exchange carries one (group, dim, sum,
    count) row per partition, never the exploded corpus. Long output
    (rows, not re-assembled arrays) keeps the result oracle-expressible
    and join-ready; ``array_agg`` the dims back if a vector is needed.

    At 100 TB: explode inflates rows x dim inside the scan stage
    (pipelined, never materialized); the shuffle moves
    #groups x dim x #partitions partial rows — KB-scale."""
    from nginx_analytics_spark.functions.rounding import half_up

    return (
        emb.select(group, F.posexplode(as_double(vec)).alias("dim", "val"))
        .groupBy(group, "dim")
        .agg(half_up(F.avg("val"), round_to).alias("centroid"))
        .withColumn("dim", F.col("dim").cast("bigint"))
    )


def _exact_topk_sets(
    corpus: DataFrame,
    q_rows: list[tuple],
    k: int,
    id_col: str,
    vec_col: str,
    metric: str = "l2",
) -> dict[int, frozenset[int]]:
    """Exact ground-truth neighbor sets for a SMALL query sample — the
    oracle :func:`tune_ann_nprobe` scores sweeps against, in the SAME
    metric the probed index ranks by (``"l2"`` for the PQ/ADC path,
    ``"cosine"`` for the IVF path — cosine and L2 rankings coincide
    only at unit norm, so an L2 oracle under a cosine index would
    mis-score recall on any non-normalized corpus). One Arrow-batched
    matmul pass over the corpus with per-partition per-query top-k
    (the ``_pq_scan_topk`` candidate-cut pattern), then one tiny global
    window: O(sample x corpus) multiplies but only
    O(sample x k x partitions) rows ever shuffle. Self-matches
    excluded; ties break by neighbor id, matching both probe paths."""
    qids = np.array([r[0] for r in q_rows])
    qv = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qnorm = np.einsum("ij,ij->i", qv, qv)

    def _scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            x = np.stack(pdf["_v"].to_numpy())
            xx = np.einsum("ij,ij->i", x, x)
            if metric == "cosine":
                # rank by cosine DESC == negated cosine ASC
                denom = np.maximum(
                    np.sqrt(qnorm)[:, None] * np.sqrt(xx)[None, :], 1e-12
                )
                d = -(qv @ x.T) / denom
            else:
                # |q - x|^2 = |q|^2 - 2 q.x + |x|^2
                d = qnorm[:, None] - 2.0 * (qv @ x.T) + xx[None, :]
            rows = []
            for qi, qid in enumerate(qids):
                mask = ids != qid
                di, ii = d[qi][mask], ids[mask]
                top = np.lexsort((ii, di))[:k]
                rows.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ii[top],
                         "dist": di[top]}
                    )
                )
            yield pd.concat(rows, ignore_index=True)

    cands = corpus.select(
        F.col(id_col), as_double(vec_col).alias("_v")
    ).mapInPandas(_scan, "query_id long, neighbor_id long, dist double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    got = (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .collect()
    )
    out: dict[int, set[int]] = {}
    for r in got:
        out.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    return {q: frozenset(s) for q, s in out.items()}


def tune_ann_nprobe(
    spark,
    corpus: DataFrame,
    path: str,
    target_recall: float = 0.6,
    k: int = 5,
    sample_queries: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs=None,
) -> dict:
    """X89: the recall/latency knob, tuned by measurement instead of
    folklore — find the smallest ``nprobe`` whose measured recall@k on
    a deterministic query sample meets ``target_recall``, for an
    at-rest IVF or celled PQ index (sidecar-detected). Every scaling
    probe this repo ran (SCALING.md r9–r13) shows the same law: indexed
    ANN recall tracks the SCAN FRACTION nprobe/n_cells, and the right
    fraction depends on the corpus's geometry — a number an operator
    should measure per index, not copy from a different dataset's
    defaults. This job packages that measurement: sample queries FROM
    the corpus (deterministic crc32 order — re-runs tune identically),
    compute exact ground truth once in the INDEX's own ranking
    metric (one Arrow matmul pass, :func:`_exact_topk_sets` — L2 for
    PQ/ADC, cosine for IVF), then sweep nprobe by DOUBLING and
    binary-search the gap between the last miss and the first hit —
    O(log n_cells) probes instead of n_cells.

    Monotonicity note: probed-cell sets are nested in nprobe, so IVF
    recall (exact scoring within probed cells) is monotone by
    construction; the PQ path's fraction-sized refine makes it
    monotone-in-expectation (a larger candidate pool can displace a
    true neighbor from the ADC shortlist by quantization noise). The
    full sweep lands in the result so the operator sees the measured
    curve, not just the answer — and the result carries a
    ``non_monotone`` flag (r13 ADVICE): True when any measured recall
    DECREASED as nprobe grew, which on the PQ path means the
    doubling/binary-search minimality certificate holds only at the
    probed points (an unprobed smaller nprobe could spike above the
    target); the value below the returned ``nprobe`` is always among
    the probed points by construction (binary search terminates at
    ``hi - lo == 1`` with ``lo`` measured, or at ``nprobe=1``), so
    local minimality is certified either way. On IVF the flag firing
    would indicate a bug, pinned by test.

    Returns ``{"kind", "n_cells", "nprobe", "recall", "met",
    "non_monotone", "scan_fraction", "sweep", "k", "sample_queries",
    "target_recall"}``
    — ``met=False`` reports the full-scan ceiling (nprobe = n_cells)
    when the target is unreachable at this index configuration, which
    is itself the actionable answer (raise m/n_codes or refine_frac,
    not nprobe). Cost: the ground-truth pass is O(sample x corpus)
    multiplies ONCE, each probe costs one production-shaped query
    batch — an offline advisor job, run per index build or after a
    rebuild, exactly like ``jobs recluster-ivf``/``rebuild-pq``
    (CLI: ``jobs tune-ann``)."""
    from nginx_analytics_spark.operators.index_fs import LOCAL_FS

    fs = fs or LOCAL_FS
    if fs.isfile(pq_index_meta_path(path)):
        meta = read_pq_index_meta(path, fs=fs)
        if meta.get("n_cells") is None:
            raise ValueError(
                f"PQ index at {path!r} is flat — nprobe has nothing to "
                "tune; rebuild with pq_write_index(n_cells=...)"
            )
        kind = "pq"
    elif fs.isfile(ivf_index_meta_path(path)):
        meta = read_ivf_index_meta(path, fs=fs)
        kind = "ivf"
    else:
        raise ValueError(
            f"no celled ANN index sidecar at {path!r} "
            "(_pq_meta/_ivf_meta.json)"
        )
    if meta["id_col"] != id_col:
        raise ValueError(
            f"index at {path!r} stores ids in column "
            f"{meta['id_col']!r}, not {id_col!r}"
        )
    n_cells = int(meta["n_cells"])

    sample = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.crc32(F.col(id_col).cast("string")), F.col(id_col))
        .limit(int(sample_queries))
    )
    q_rows = sample.select(
        F.col(id_col), as_double(vec_col).alias("qv")
    ).collect()
    if not q_rows:
        raise ValueError("empty corpus — nothing to sample queries from")
    queries = sample.select(
        F.col(id_col).alias("query_id"), F.col(vec_col)
    ).localCheckpoint(eager=True)  # probed O(log n_cells) times
    # ground truth in the metric the probed index RANKS by: the PQ/ADC
    # path scores squared L2, the IVF path exact cosine within probed
    # cells — the two coincide only on unit-norm corpora
    truth = _exact_topk_sets(
        corpus, q_rows, k, id_col, vec_col,
        metric="l2" if kind == "pq" else "cosine",
    )

    def probe(nprobe: int) -> float:
        if kind == "pq":
            out = pq_topk_indexed(
                spark, corpus, queries, path, k=k, id_col=id_col,
                vec_col=vec_col, nprobe=nprobe, fs=fs,
            )
        else:
            out = ivf_topk_bucketed(
                spark, path, None, queries, k=k, id_col=id_col,
                vec_col=vec_col, nprobe=nprobe, fs=fs,
            )
        got: dict[int, set[int]] = {}
        for r in out.collect():
            got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
        hits = sum(
            len(truth[q] & got.get(q, set())) for q in truth
        )
        return hits / max(1, sum(len(truth[q]) for q in truth))

    sweep: list[dict] = []

    def measured(n: int) -> float:
        r = probe(n)
        sweep.append({"nprobe": n, "recall": round(r, 4)})
        return r

    lo, hi, hi_recall = 0, None, None
    n = 1
    while n < n_cells:
        r = measured(n)
        if r >= target_recall:
            hi, hi_recall = n, r
            break
        lo = n
        n *= 2
    if hi is None:
        r = measured(n_cells)
        if r >= target_recall:
            hi, hi_recall = n_cells, r
            lo = min(lo, n_cells - 1)
        else:
            sweep.sort(key=lambda s: s["nprobe"])
            return {
                "kind": kind, "n_cells": n_cells, "nprobe": n_cells,
                "recall": round(r, 4), "met": False,
                "non_monotone": _sweep_non_monotone(sweep),
                "scan_fraction": 1.0, "sweep": sweep, "k": k,
                "sample_queries": len(q_rows),
                "target_recall": target_recall,
            }
    while hi - lo > 1:
        mid = (lo + hi) // 2
        r = measured(mid)
        if r >= target_recall:
            hi, hi_recall = mid, r
        else:
            lo = mid
    sweep.sort(key=lambda s: s["nprobe"])
    return {
        "kind": kind, "n_cells": n_cells, "nprobe": int(hi),
        "recall": round(float(hi_recall), 4), "met": True,
        "non_monotone": _sweep_non_monotone(sweep),
        "scan_fraction": round(hi / n_cells, 4), "sweep": sweep,
        "k": k, "sample_queries": len(q_rows),
        "target_recall": target_recall,
    }


def _sweep_non_monotone(sweep: list[dict]) -> bool:
    """True when any measured recall DECREASED as nprobe grew (the
    sweep list must already be nprobe-sorted) — the r13 ADVICE flag:
    a non-monotone PQ sweep means the tuner's minimality certificate
    holds only at the probed points."""
    return any(
        b["recall"] < a["recall"] for a, b in zip(sweep, sweep[1:])
    )
