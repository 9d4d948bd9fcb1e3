"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY.md §5: the reference has no property-based testing at all).

Each property runs few examples (Spark jobs are expensive) but explores
shapes/values a fixed fixture never would: ragged block grids, arbitrary
group keys, negative/duplicate values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wukong_spark.blockmatrix import BlockMatrix
from wukong_spark.operators.skew import salted_agg

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    # fixed example sequence: random draws occasionally hit pathological
    # corners (e.g. an 80²/3-block Cholesky = 27 driver-sequential steps
    # ≈ 100+ latency-bound Spark jobs) and a "fast" suite run turns into
    # a 30-minute one; derandomized draws keep the cost profile stable
    derandomize=True,
)


@given(
    n=st.integers(2, 60),
    m=st.integers(2, 60),
    br=st.integers(1, 25),
    bc=st.integers(1, 25),
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_block_roundtrip_any_grid(spark, n, m, br, bc, seed):
    """from_numpy → to_numpy is exact for ANY (shape, block) combination,
    including ragged edge blocks."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, m))
    assert np.array_equal(BlockMatrix.from_numpy(spark, a, br, bc).to_numpy(), a)


@given(
    n=st.integers(2, 30),
    k=st.integers(2, 30),
    m=st.integers(2, 30),
    blk=st.integers(2, 16),
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_gemm_matches_numpy_any_shape(spark, n, k, m, blk, seed):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, k))
    b = rng.standard_normal((k, m))
    got = (
        BlockMatrix.from_numpy(spark, a, blk, blk)
        .matmul(BlockMatrix.from_numpy(spark, b, blk, blk))
        .to_numpy()
    )
    assert np.allclose(got, a @ b, atol=1e-10)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("abcd"), st.integers(-1000, 1000)),
        min_size=1,
        max_size=200,
    ),
    buckets=st.integers(1, 16),
)
@settings(**SETTINGS)
def test_salted_agg_equals_plain(spark, rows, buckets):
    """Salting never changes count/sum/min/max, for any data and any bucket
    count (including buckets=1 = no salting)."""
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    df = spark.createDataFrame(pdf)
    got = {
        tuple(r)
        for r in salted_agg(
            df,
            ["k"],
            {"n": ("count", None), "s": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
            buckets=buckets,
        ).collect()
    }
    want = {
        tuple(r)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


@given(
    n=st.integers(12, 120),
    m=st.integers(8, 60),
    br=st.integers(4, 32),
    npanels=st.integers(1, 5),  # panel COUNT, not width: the CGS2 loop is
    # driver-sequential per panel, so bound the panel count directly
    force_panels=st.booleans(),
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_general_qr_properties_any_shape(spark, n, m, br, npanels, force_panels, seed):
    """General multi-block-column QR invariants for any tall/square shape,
    both strategies (single-panel re-block and the CGS2 panel loop):
    QᵀQ = I, QR = A, R upper triangular."""
    if n < m:
        n, m = m, n  # qr() requires n_rows ≥ n_cols
    bc = max(4, (m + npanels - 1) // npanels)
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, m))
    q, r = BlockMatrix.from_numpy(spark, a, br, bc).qr(force_panels=force_panels)
    qn = q.to_numpy()
    assert np.allclose(qn.T @ qn, np.eye(m), atol=1e-8)
    assert np.allclose(qn @ r, a, atol=1e-8)
    assert np.allclose(r, np.triu(r), atol=1e-8)


@given(
    n=st.integers(6, 80),
    nb=st.integers(1, 6),  # BLOCK-GRID size, not block size: the loop is
    # driver-sequential with ~4 jobs per step, so cost is linear in the
    # grid — draw it directly to bound the per-example job count
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_cholesky_properties_any_blocking(spark, n, nb, seed):
    """Distributed Cholesky for any (size, blocking) incl. ragged edge
    blocks: L lower-triangular, LLᵀ = A, matches numpy."""
    bs = max(1, (n + nb - 1) // nb)
    rng = np.random.default_rng(seed)
    g = rng.standard_normal((n, n))
    spd = g @ g.T / n + 2.0 * np.eye(n)
    from wukong_spark.blockmatrix import cholesky_blocked

    l_mat = cholesky_blocked(BlockMatrix.from_numpy(spark, spd, bs, bs)).to_numpy()
    assert np.allclose(l_mat, np.tril(l_mat))
    assert np.allclose(l_mat @ l_mat.T, spd, atol=1e-8)
    assert np.allclose(l_mat, np.linalg.cholesky(spd), atol=1e-8)


@given(
    n=st.integers(2, 80),
    k=st.integers(2, 80),
    m=st.integers(2, 80),
    br=st.integers(2, 30),
    bk=st.integers(2, 30),
    bc=st.integers(2, 30),
    sa=st.integers(0, 10_000),
    sb=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_gemm_fused_equals_materialized_any_shape(spark, n, k, m, br, bk, bc, sa, sb):
    """Fused seed-generated GEMM (keys-only shuffle + in-task regeneration)
    must equal the materialized product EXACTLY for any shape/blocking —
    to_numpy() evaluates the real generator, matmul the fused path."""
    a = BlockMatrix.random(spark, n, k, br, bk, seed=sa)
    b = BlockMatrix.random(spark, k, m, bk, bc, seed=sb)
    got = a.matmul(b).to_numpy()
    assert np.allclose(got, a.to_numpy() @ b.to_numpy(), atol=1e-10)


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=20, deadline=None, derandomize=True)
def test_bmp_roundtrip_any_dims(h, w, seed):
    """BMP encode→decode is pixel-exact for ANY dims (all four row-pad
    residues included) — pure-local, so many examples are cheap."""
    from wukong_spark.operators.multimodal import decode_bmp, encode_bmp

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@given(
    n=st.integers(1, 5000),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=20, deadline=None, derandomize=True)
def test_wav_roundtrip_any_length(n, sr, seed):
    from wukong_spark.operators.multimodal import decode_wav, encode_wav_pcm16

    x = np.random.default_rng(seed).uniform(-1, 1, n)
    srate, nch, got = decode_wav(encode_wav_pcm16(x, sr))
    assert (srate, nch, len(got)) == (sr, 1, n)
    assert np.abs(got - x).max() <= 1.0 / 32767


@given(
    sh=st.integers(1, 30),
    sw=st.integers(1, 30),
    th=st.integers(1, 30),
    tw=st.integers(1, 30),
)
@settings(max_examples=20, deadline=None, derandomize=True)
def test_resize_nearest_any_dims(sh, sw, th, tw):
    """Resize picks only source pixels (no interpolation artifacts) and
    always yields the target shape, up- or down-scaling."""
    from wukong_spark.operators.multimodal import resize_nearest

    px = np.random.default_rng(1).integers(0, 256, size=(sh, sw, 3), dtype=np.uint8)
    out = resize_nearest(px, th, tw)
    assert out.shape == (th, tw, 3)
    src_set = {bytes(p) for row in px for p in row}
    assert all(bytes(p) in src_set for row in out for p in row)


@given(
    n=st.integers(8, 200),
    c=st.integers(1, 12),
    br=st.integers(4, 64),
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_tsqr_properties_any_shape(spark, n, c, br, seed):
    """TSQR invariants for any tall shape: QᵀQ = I, QR = A, R upper
    triangular with non-negative diagonal."""
    if n < c:
        n = c  # keep it tall (or square)
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, c))
    q, r = BlockMatrix.from_numpy(spark, a, br, c).tsqr()
    qn = q.to_numpy()
    assert np.allclose(qn.T @ qn, np.eye(c), atol=1e-9)
    assert np.allclose(qn @ r, a, atol=1e-9)
    assert np.allclose(r, np.triu(r), atol=1e-12)
    assert (np.diag(r) >= -1e-12).all()


@given(
    n=st.integers(10, 60),
    m=st.integers(10, 60),
    br1=st.integers(4, 20),
    bc1=st.integers(4, 20),
    br2=st.integers(4, 20),
    bc2=st.integers(4, 20),
    seed=st.integers(0, 100),
)
@settings(**SETTINGS)
def test_rechunk_roundtrip_property(spark, n, m, br1, bc1, br2, bc2, seed):
    """rechunk is bitwise-exact data movement for ANY source/target
    blocking pair, including mutually ragged grids."""
    rng = np.random.default_rng(seed)
    a = rng.random((n, m))
    src = BlockMatrix.from_numpy(spark, a, br1, bc1)
    out = src.rechunk(br2, bc2)
    assert np.array_equal(out.to_numpy(), a)
    assert np.array_equal(out.rechunk(br1, bc1).to_numpy(), a)


@given(
    n1=st.integers(5, 40),
    n2=st.integers(5, 40),
    m=st.integers(5, 30),
    br1=st.integers(3, 12),
    br2=st.integers(3, 12),
    seed=st.integers(0, 100),
)
@settings(**SETTINGS)
def test_vstack_slice_property(spark, n1, n2, m, br1, br2, seed):
    """vstack of arbitrary mutually-ragged blockings equals np.vstack, and
    slicing the halves back out recovers each input bitwise."""
    rng = np.random.default_rng(seed)
    a, b = rng.random((n1, m)), rng.random((n2, m))
    ma = BlockMatrix.from_numpy(spark, a, br1, max(3, m // 2))
    mb = BlockMatrix.from_numpy(spark, b, br2, max(2, m // 3))
    v = ma.vstack(mb)
    dense = np.vstack([a, b])
    assert np.array_equal(v.to_numpy(), dense)
    assert np.array_equal(v.slice(0, n1, 0, m).to_numpy(), a)
    assert np.array_equal(v.slice(n1, n1 + n2, 0, m).to_numpy(), b)


# -- codec properties (r7: local, no Spark — more examples affordable) ------

LOCAL_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ch=st.sampled_from([1, 2, 3, 4]),
    mode=st.sampled_from(["mixed", "none"]),
    seed=st.integers(0, 10_000),
)
@settings(**LOCAL_SETTINGS)
def test_png_roundtrip_property(h, w, ch, mode, seed):
    from wukong_spark.operators.multimodal import decode_png, encode_png

    px = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, filter_mode=mode)), px)


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ch=st.sampled_from([1, 3, 4]),
    interlace=st.booleans(),
    depth=st.sampled_from([1, 2, 4, 8]),
    seed=st.integers(0, 10_000),
)
@settings(**LOCAL_SETTINGS)
def test_png_palette_and_adam7_roundtrip_property(h, w, ch, interlace, depth, seed):
    from wukong_spark.operators.multimodal import (
        decode_png,
        encode_png,
        encode_png_palette,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, interlace=interlace)), px)
    n = min(1 << depth, 256)
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    got = decode_png(encode_png_palette(idx, pal, depth=depth, interlace=interlace))
    assert np.array_equal(got, pal[idx])


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    npal=st.integers(1, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 10_000),
)
@settings(**LOCAL_SETTINGS)
def test_gif_roundtrip_property(h, w, npal, interlace, seed):
    from wukong_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
    idx = rng.integers(0, npal, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal, interlace=interlace)), pal[idx])


@given(
    mcs=st.integers(2, 8),
    n=st.integers(0, 3000),
    alphabet=st.integers(1, 256),
    seed=st.integers(0, 10_000),
)
@settings(**LOCAL_SETTINGS)
def test_gif_lzw_roundtrip_property(mcs, n, alphabet, seed):
    from wukong_spark.operators.gif import lzw_compress, lzw_decompress

    hi = min(alphabet, 1 << mcs)
    idx = np.random.default_rng(seed).integers(0, hi, n).astype(np.uint8)
    assert np.array_equal(lzw_decompress(lzw_compress(idx, mcs), mcs, n), idx)


@given(h=st.integers(1, 32), w=st.integers(1, 32), seed=st.integers(0, 10_000))
@settings(max_examples=10, deadline=None, derandomize=True)
def test_jpeg_q100_bounded_error_property(h, w, seed):
    from wukong_spark.operators.jpeg import decode_jpeg, encode_jpeg

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=100, subsampling="444"))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 2


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    sub=st.sampled_from(["444", "420"]),
    q=st.sampled_from([30, 85, 100]),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=12, deadline=None, derandomize=True)
def test_jpeg_progressive_matches_baseline_property(h, w, sub, q, seed):
    """Progressive coding is lossless over the quantized coefficients:
    decode(progressive bytes) ≡ decode(baseline bytes) bit-for-bit."""
    from wukong_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=q, subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(px, quality=q, subsampling=sub))
    assert np.array_equal(base, prog)


@given(
    n=st.integers(1, 2000),
    law=st.sampled_from(["ulaw", "alaw"]),
    seed=st.integers(0, 10_000),
)
@settings(**LOCAL_SETTINGS)
def test_g711_bounded_error_property(n, law, seed):
    from wukong_spark.operators.multimodal import decode_wav, encode_wav_g711

    x = np.random.default_rng(seed).uniform(-0.99, 0.99, n)
    _, _, y = decode_wav(encode_wav_g711(x, 8000, law))
    # G.711 worst-case segment step ≈ |x|/16 + smallest-step floor
    assert np.all(np.abs(y - x) <= np.abs(x) / 8 + 0.01)


@given(
    h=st.integers(1, 30),
    w=st.integers(1, 30),
    ch=st.sampled_from([1, 2, 3, 4]),
    comp=st.sampled_from(["none", "packbits"]),
    rps=st.integers(1, 20),
    seed=st.integers(0, 10_000),
)
@settings(**LOCAL_SETTINGS)
def test_tiff_roundtrip_property(h, w, ch, comp, rps, seed):
    from wukong_spark.operators.tiff import decode_tiff, encode_tiff

    px = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    out = decode_tiff(encode_tiff(px, compression=comp, rows_per_strip=rps))
    assert np.array_equal(out, px)


@given(n=st.integers(1, 3000), seed=st.integers(0, 10_000))
@settings(**LOCAL_SETTINGS)
def test_packbits_roundtrip_property(n, seed):
    from wukong_spark.operators.tiff import packbits_decode, packbits_encode

    rng = np.random.default_rng(seed)
    # mix of runs and noise: interleave run segments with random bytes
    parts = []
    while sum(map(len, parts)) < n:
        if rng.random() < 0.5:
            parts.append(bytes([rng.integers(0, 256)]) * int(rng.integers(1, 200)))
        else:
            parts.append(bytes(rng.integers(0, 256, int(rng.integers(1, 50)), dtype=np.uint8)))
    data = b"".join(parts)[:n]
    assert packbits_decode(packbits_encode(data), n) == data


@given(
    n=st.integers(1, 2000),
    container=st.sampled_from(["au_ulaw", "au_pcm16", "aiff"]),
    seed=st.integers(0, 10_000),
)
@settings(**LOCAL_SETTINGS)
def test_au_aiff_bounded_error_property(n, container, seed):
    from wukong_spark.operators.multimodal import (
        decode_aiff,
        decode_au,
        encode_aiff_pcm16,
        encode_au,
    )

    x = np.random.default_rng(seed).uniform(-0.99, 0.99, n)
    if container == "au_ulaw":
        _, _, y = decode_au(encode_au(x, 8000, "ulaw"))
        assert np.all(np.abs(y - x) <= np.abs(x) / 8 + 0.01)
    elif container == "au_pcm16":
        _, _, y = decode_au(encode_au(x, 8000, "pcm16"))
        assert np.abs(y - x).max() <= 1 / 32000
    else:
        _, _, y = decode_aiff(encode_aiff_pcm16(x, 8000))
        assert np.abs(y - x).max() <= 1 / 32000


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    word=st.text(alphabet="ab", min_size=1, max_size=12),
    l=st.sampled_from("ab"),
    r=st.sampled_from("ab"),
)
def test_bpe_merge_fold_is_greedy_left_to_right(spark, word, l, r):
    """The JVM aggregate fold in text_bpe_train_merges must apply a
    merge exactly like reference BPE: greedy, left-to-right,
    non-overlapping ('aaa' + (a,a) -> [aa, a])."""
    merged = l + r

    def ref(syms):
        out = []
        for x in syms:
            if out and out[-1] == l and x == r:
                out[-1] = merged
            else:
                out.append(x)
        return out

    df = spark.createDataFrame([(list(word),)], "syms array<string>")
    got = df.select(
        F.expr(
            f"aggregate(slice(syms, 2, size(syms)-1), array(syms[0]), "
            f"(acc, x) -> CASE WHEN element_at(acc, -1) = '{l}'"
            f" AND x = '{r}' "
            f"THEN concat(slice(acc, 1, size(acc)-1), array('{merged}')) "
            f"ELSE concat(acc, array(x)) END)"
        ).alias("m")
    ).collect()[0]["m"]
    assert got == ref(list(word)), (word, l, r)


@given(
    n=st.integers(20, 90),
    k=st.integers(20, 90),
    m=st.integers(20, 90),
    br=st.integers(10, 40),
    bk=st.integers(10, 40),
    bc=st.integers(10, 40),
    density=st.sampled_from([0.02, 0.1, 0.4]),
    seed=st.integers(0, 10),
)
@settings(**SETTINGS)
def test_spgemm_equals_numpy_any_shape(
    spark, n, k, m, br, bk, bc, density, seed
):
    """SpGEMM (r11): sparse COO block matmul equals the numpy product
    EXACTLY for any dims/blocking/density — integer-valued nonzeros make
    float64 sums order-independent, so the check is == not allclose."""
    from wukong_spark.sparse import SparseBlockMatrix

    rng = np.random.default_rng(seed)
    A = np.where(
        rng.random((n, k)) >= density, 0.0, np.floor(rng.random((n, k)) * 9) + 1
    )
    B = np.where(
        rng.random((k, m)) >= density, 0.0, np.floor(rng.random((k, m)) * 9) + 1
    )
    sa = SparseBlockMatrix.from_dense(BlockMatrix.from_numpy(spark, A, br, bk))
    sb = SparseBlockMatrix.from_dense(BlockMatrix.from_numpy(spark, B, bk, bc))
    got = sa.matmul(sb).to_dense().to_numpy()
    assert got.shape == (n, m)
    assert (got == A @ B).all()


@given(
    rows=st.integers(1, 400),
    nparts=st.integers(2, 12),
    kbuckets=st.integers(2, 10),
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_rank_cut_family_equals_windows(spark, rows, nparts, kbuckets, seed):
    """The r14 rank-cut family must equal the window formulations it
    replaces, for ANY row count / partitioning / bucket count:
    - global_cumsum == SUM OVER (ORDER BY) rows-unbounded-preceding;
    - global_cumsum(row_col=...) == ROW_NUMBER()-1 over the same order;
    - ntile_boundaries + rank_cut_values classification == NTILE(k)
      (duplicate values included — the custkey-style tiebreak makes the
      composite key a total order)."""
    from pyspark.sql.window import Window

    from wukong_spark.operators.setindex import (
        global_cumsum,
        ntile_boundaries,
        rank_cut_values,
    )

    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "k": np.arange(rows, dtype=np.int64),
            # duplicates on purpose: v alone is NOT a total order
            "v": rng.integers(-50, 50, rows).astype(np.int64),
        }
    )
    df = spark.createDataFrame(pdf)

    got = (
        global_cumsum(
            df, "v", ["v", "k"], n_partitions=nparts, out_col="c",
            row_col="rid",
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    w = Window.orderBy("v", "k")
    want = (
        df.select(
            "k",
            "v",
            F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("c"),
            (F.row_number().over(w) - 1).alias("rid"),
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (got["c"].to_numpy() == want["c"].to_numpy()).all()
    assert (got["rid"].to_numpy() == want["rid"].to_numpy()).all()

    bounds = ntile_boundaries(rows, kbuckets)
    cuts = rank_cut_values(df, ["v", "k"], bounds, n_partitions=nparts)
    key = F.struct(F.col("v"), F.col("k"))
    col = None
    for b, rid in enumerate(bounds):
        if rid not in cuts:
            continue
        cut = F.struct(
            F.lit(int(cuts[rid]["v"])).cast("long"),
            F.lit(int(cuts[rid]["k"])).cast("long"),
        )
        cond = key <= cut
        col = F.when(cond, b + 1) if col is None else col.when(cond, b + 1)
    bucket = (
        col.otherwise(kbuckets) if col is not None else F.lit(kbuckets)
    )
    got_b = (
        df.select("k", bucket.alias("b"))
        .toPandas()
        .sort_values("k")["b"]
        .to_numpy()
    )
    want_b = (
        df.select("k", F.ntile(kbuckets).over(w).alias("b"))
        .toPandas()
        .sort_values("k")["b"]
        .to_numpy()
    )
    assert (got_b == want_b).all()


@given(
    n_left=st.integers(1, 120),
    n_right=st.integers(0, 120),
    seed=st.integers(0, 10_000),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.sampled_from([None, 0, 3, 25]),
)
@settings(**SETTINGS)
def test_merge_asof_matches_pandas(spark, n_left, n_right, seed, direction, tol):
    """operators/asof.merge_asof (r14) must agree with pandas.merge_asof
    for every direction and tolerance, including empty right sides,
    by-keys with no matches, and duplicate left timestamps.  Right `on`
    values are unique per key (pandas resolves duplicate right keys by
    input position, which has no distributed meaning — the operator
    docstring pins its own deterministic tie-break instead)."""
    from wukong_spark.operators.asof import merge_asof

    rng = np.random.default_rng(seed)
    lp = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_left),
            "t": rng.integers(0, 200, n_left).astype(np.int64) * 2 + 1,
            "lid": np.arange(n_left, dtype=np.int64),
        }
    )
    # right timestamps EVEN and unique per key -> no exact-tie 'nearest'
    # distances (odd-even gap) and no duplicate right keys
    rp = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 4, n_right),
                "t": rng.integers(0, 220, n_right).astype(np.int64) * 2,
                "rv": rng.integers(-50, 50, n_right).astype(np.int64),
            }
        )
        .drop_duplicates(["k", "t"])
        .reset_index(drop=True)
    )
    ldf = spark.createDataFrame(lp)
    rdf = (
        spark.createDataFrame(rp)
        if len(rp)
        else spark.createDataFrame([], "k long, t long, rv long")
    )
    got = (
        merge_asof(ldf, rdf, on="t", by="k", direction=direction, tolerance=tol)
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lp.sort_values("t", kind="stable"),
        rp.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction=direction,
        tolerance=tol,
    ).sort_values("lid").reset_index(drop=True)
    gv = got["r_rv"].astype("float64")
    wv = want["rv"].astype("float64")
    assert ((gv == wv) | (gv.isna() & wv.isna())).all(), (
        pd.concat([got, want.add_prefix("w_")], axis=1)
    )


@given(
    rows=st.integers(1, 300),
    nparts=st.integers(2, 12),
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_global_cummax_equals_window(spark, rows, nparts, seed):
    """global_cummax (r14) == MAX OVER (ORDER BY) rows-unbounded-
    preceding for any row count / partitioning, duplicates included."""
    from pyspark.sql.window import Window

    from wukong_spark.operators.setindex import global_cummax

    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "k": np.arange(rows, dtype=np.int64),
            "v": rng.integers(-1000, 1000, rows).astype(np.int64),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        global_cummax(df, "v", "k", n_partitions=nparts, out_col="m")
        .toPandas()
        .sort_values("k")["m"]
        .to_numpy()
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.select("k", F.max("v").over(w).alias("m"))
        .toPandas()
        .sort_values("k")["m"]
        .to_numpy()
    )
    assert (got == want).all()


@given(
    n_left=st.integers(1, 80),
    n_right=st.integers(0, 80),
    seed=st.integers(0, 10_000),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
@settings(**SETTINGS)
def test_merge_asof_timestamps_match_pandas(spark, n_left, n_right, seed, direction):
    """merge_asof with TIMESTAMP `on` columns (the production type) must
    agree with pandas.merge_asof — same odd/even-second trick to avoid
    exact-tie nearest distances and duplicate right keys."""
    from wukong_spark.operators.asof import merge_asof

    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    lp = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_left),
            "t": base
            + pd.to_timedelta(
                rng.integers(0, 500, n_left) * 2 + 1, unit="s"
            ),
            "lid": np.arange(n_left, dtype=np.int64),
        }
    )
    rp = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 3, n_right),
                "t": base
                + pd.to_timedelta(rng.integers(0, 520, n_right) * 2, unit="s"),
                "rv": rng.integers(-50, 50, n_right).astype(np.int64),
            }
        )
        .drop_duplicates(["k", "t"])
        .reset_index(drop=True)
    )
    ldf = spark.createDataFrame(lp)
    rdf = (
        spark.createDataFrame(rp)
        if len(rp)
        else spark.createDataFrame([], "k long, t timestamp, rv long")
    )
    got = (
        merge_asof(ldf, rdf, on="t", by="k", direction=direction)
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lp.sort_values("t", kind="stable"),
        rp.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction=direction,
    ).sort_values("lid").reset_index(drop=True)
    gv = got["r_rv"].astype("float64")
    wv = want["rv"].astype("float64")
    assert ((gv == wv) | (gv.isna() & wv.isna())).all()


def test_global_cumsum_float_multibatch(spark):
    """ADVICE r14 (medium): float running sums must keep their fractional
    part across Arrow batch boundaries — the old accumulator did
    int(sum) per batch, drifting from the second batch of a partition
    on.  Forces >1 batch per partition via the Arrow batch-size conf;
    values are multiples of 0.25 so the float sums are exact binary and
    the window comparison can be equality."""
    from pyspark.sql.window import Window

    from wukong_spark.operators.setindex import global_cumsum

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "16")
    try:
        rng = np.random.default_rng(7)
        pdf = pd.DataFrame(
            {
                "k": np.arange(200, dtype=np.int64),
                "v": rng.integers(-20, 20, 200).astype(np.float64) * 0.25,
            }
        )
        df = spark.createDataFrame(pdf)
        got = (
            global_cumsum(df, "v", "k", n_partitions=4, out_col="c")
            .toPandas()
            .sort_values("k")["c"]
            .to_numpy()
        )
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        want = (
            df.select("k", F.sum("v").over(w).alias("c"))
            .toPandas()
            .sort_values("k")["c"]
            .to_numpy()
        )
        assert (got == want).all()
    finally:
        spark.conf.set(key, old)


def test_global_prefix_family_null_partitions(spark):
    """ADVICE r14 (low): a range partition whose value column is entirely
    NULL yields NULL agg partials — the driver prefix loops must
    coalesce/skip them instead of raising TypeError, and NaN rows must
    not poison the cummax running peak.  Semantics at NULL rows follow
    pandas: cumsum emits NULL there, cummax inherits the running peak
    (NULL until the first value); non-NULL rows match the window
    formulations exactly."""
    from pyspark.sql.window import Window

    from wukong_spark.operators.setindex import global_cummax, global_cumsum

    rows = 120
    pdf = pd.DataFrame(
        {
            "k": np.arange(rows, dtype=np.int64),
            # k < 40 entirely NULL: with 8 range partitions on k, the
            # first ~2-3 partitions carry only NULL values
            "v": [None if i < 40 else float(i % 17) for i in range(rows)],
        }
    )
    df = spark.createDataFrame(pdf, "k long, v double")

    got_sum = (
        global_cumsum(df, "v", "k", n_partitions=8, out_col="c")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    got_max = (
        global_cummax(df, "v", "k", n_partitions=8, out_col="m")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.select(
            "k",
            F.sum("v").over(w).alias("c"),
            F.max("v").over(w).alias("m"),
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    nn = got_sum["v"].notna()
    assert (
        got_sum.loc[nn, "c"].to_numpy() == want.loc[nn, "c"].to_numpy()
    ).all()
    # NULL rows: cumsum emits NULL (pandas semantics)
    assert got_sum.loc[~nn, "c"].isna().all()
    # cummax: every row ≥ first value matches the window exactly (fmax
    # carries the peak across NaN rows); leading all-NULL prefix is NULL
    assert (
        got_max.loc[nn, "m"].to_numpy() == want.loc[nn, "m"].to_numpy()
    ).all()
    assert got_max.loc[~nn, "m"].isna().all()


def test_merge_asof_quoted_right_column_names(spark):
    """ADVICE r14 (low): right-side payload columns whose names need
    backtick quoting (spaces, dashes, dots) must survive the typed-NULL
    struct literal — the DataType must be passed as an object, not
    round-tripped through simpleString DDL."""
    from wukong_spark.operators.asof import merge_asof

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "t": [5, 9, 7], "lid": [0, 1, 2]})
    )
    right = spark.createDataFrame(
        [(1, 4, 10.0), (1, 8, 20.0), (2, 6, 30.0)],
        ["k", "t", "weird col-na.me"],
    )
    got = (
        merge_asof(left, right, on="t", by="k", direction="backward")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert got["r_weird col-na.me"].tolist() == [10.0, 20.0, 30.0]


@given(
    n_left=st.integers(1, 80),
    n_right=st.integers(0, 60),
    seed=st.integers(0, 10_000),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    exact=st.booleans(),
    tol=st.sampled_from([None, 7]),
)
@settings(**SETTINGS)
def test_merge_asof_global_matches_pandas(
    spark, n_left, n_right, seed, direction, exact, tol
):
    """merge_asof_global (r15, VERDICT r14 item 3) must agree with
    keyless pandas.merge_asof across directions, tolerance and
    allow_exact_matches — unique right keys so pandas' position
    tie-break never diverges from the distributed struct tie-break;
    small n_partitions forces real boundary-seed exchanges."""
    from wukong_spark.operators.asof import merge_asof_global

    rng = np.random.default_rng(seed)
    lp = pd.DataFrame(
        {
            "t": np.sort(rng.integers(0, 300, n_left)).astype(np.int64),
            "lid": np.arange(n_left, dtype=np.int64),
        }
    )
    rp = (
        pd.DataFrame(
            {
                "t": rng.choice(320, size=n_right, replace=False).astype(
                    np.int64
                )
                if n_right
                else np.array([], dtype=np.int64),
                "rv": rng.integers(-50, 50, n_right).astype(np.int64),
            }
        )
        .sort_values("t", kind="stable")
        .reset_index(drop=True)
    )
    ldf = spark.createDataFrame(lp)
    rdf = (
        spark.createDataFrame(rp)
        if len(rp)
        else spark.createDataFrame([], "t long, rv long")
    )
    got = (
        merge_asof_global(
            ldf,
            rdf,
            on="t",
            direction=direction,
            tolerance=tol,
            allow_exact_matches=exact,
            n_partitions=5,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lp,
        rp,
        on="t",
        direction=direction,
        tolerance=tol,
        allow_exact_matches=exact,
    ).sort_values("lid").reset_index(drop=True)
    gv = got["r_rv"].astype("float64")
    wv = want["rv"].astype("float64")
    assert ((gv == wv) | (gv.isna() & wv.isna())).all(), (
        pd.concat([got, want.add_prefix("w_")], axis=1)
    )


@given(
    n_left=st.integers(1, 60),
    n_right=st.integers(0, 60),
    seed=st.integers(0, 10_000),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
@settings(**SETTINGS)
def test_merge_asof_keyed_exact_false_matches_pandas(
    spark, n_left, n_right, seed, direction
):
    """merge_asof(allow_exact_matches=False) (r15, VERDICT r14 item 6)
    must agree with pandas across directions — duplicate left/right
    keys at equal `on` included, since the exclusive tie order is
    exactly what the parameter changes."""
    from wukong_spark.operators.asof import merge_asof

    rng = np.random.default_rng(seed)
    lp = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_left),
            "t": rng.integers(0, 40, n_left).astype(np.int64),
            "lid": np.arange(n_left, dtype=np.int64),
        }
    ).sort_values("t", kind="stable").reset_index(drop=True)
    rp = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 3, n_right),
                "t": rng.integers(0, 44, n_right).astype(np.int64),
                "rv": rng.integers(-50, 50, n_right).astype(np.int64),
            }
        )
        .drop_duplicates(["k", "t"])
        .sort_values("t", kind="stable")
        .reset_index(drop=True)
    )
    ldf = spark.createDataFrame(lp)
    rdf = (
        spark.createDataFrame(rp)
        if len(rp)
        else spark.createDataFrame([], "k long, t long, rv long")
    )
    got = (
        merge_asof(
            ldf, rdf, on="t", by="k", direction=direction,
            allow_exact_matches=False,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction,
        allow_exact_matches=False,
    ).sort_values("lid").reset_index(drop=True)
    gv = got["r_rv"].astype("float64")
    wv = want["rv"].astype("float64")
    assert ((gv == wv) | (gv.isna() & wv.isna())).all(), (
        pd.concat([got, want.add_prefix("w_")], axis=1)
    )


@given(
    rows=st.integers(1, 300),
    nparts=st.integers(2, 12),
    seed=st.integers(0, 10_000),
    op=st.sampled_from(["sum", "max", "min", "prod"]),
)
@settings(**SETTINGS)
def test_global_scan_equals_windows(spark, rows, nparts, seed, op):
    """global_scan (r15, VERDICT r14 item 7) must equal the window
    formulation of every associative op for any row count/partitioning —
    prod over ±1 values (stays exactly representable), others over
    small ints."""
    from pyspark.sql.window import Window

    from wukong_spark.operators.setindex import global_scan

    rng = np.random.default_rng(seed)
    if op == "prod":
        v = rng.choice([-1, 1], rows).astype(np.int64)
    else:
        v = rng.integers(-1000, 1000, rows).astype(np.int64)
    pdf = pd.DataFrame({"k": np.arange(rows, dtype=np.int64), "v": v})
    df = spark.createDataFrame(pdf)
    got = (
        global_scan(df, "v", "k", op=op, n_partitions=nparts, out_col="m")
        .toPandas()
        .sort_values("k")["m"]
        .to_numpy()
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    agg = {"sum": F.sum, "max": F.max, "min": F.min}.get(op)
    if agg is not None:
        want = (
            df.select("k", agg("v").over(w).alias("m"))
            .toPandas()
            .sort_values("k")["m"]
            .to_numpy()
        )
    else:
        want = np.cumprod(pdf["v"].to_numpy())
    assert (got == want).all(), (op, got[:10], want[:10])


@given(
    rows=st.integers(1, 200),
    nparts=st.integers(2, 10),
    seed=st.integers(0, 10_000),
    op=st.sampled_from(["sum", "max", "min", "prod"]),
)
@settings(**SETTINGS)
def test_global_scan_nan_float(spark, rows, nparts, seed, op):
    """ADVICE r15 regression: a NaN anywhere in a float column must NOT
    poison the broadcast prefix — partials are computed NaN-safely, so
    the scan keeps pandas cum* semantics (NaN row emits NaN, the running
    value carries past) even when whole partitions sit after a NaN.
    Values are exact-in-float64 (small ints / ±1) so the partition-fold
    association can't introduce rounding drift."""
    from wukong_spark.operators.setindex import global_scan

    rng = np.random.default_rng(seed)
    if op == "prod":
        v = rng.choice([-1.0, 1.0], rows)
    else:
        v = rng.integers(-1000, 1000, rows).astype(np.float64)
    v[rng.random(rows) < 0.3] = np.nan
    pdf = pd.DataFrame({"k": np.arange(rows, dtype=np.int64), "v": v})
    df = spark.createDataFrame(pdf)
    got = (
        global_scan(df, "v", "k", op=op, n_partitions=nparts, out_col="m")
        .toPandas()
        .sort_values("k")["m"]
        .to_numpy()
    )
    want = getattr(
        pdf["v"], {"sum": "cumsum", "max": "cummax", "min": "cummin",
                   "prod": "cumprod"}[op]
    )().to_numpy()
    ok = (got == want) | (np.isnan(got) & np.isnan(want))
    assert ok.all(), (op, np.flatnonzero(~ok)[:5], got[:10], want[:10])


@given(
    rows_l=st.integers(1, 80),
    rows_r=st.integers(0, 80),
    seed=st.integers(0, 10_000),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    exact=st.booleans(),
)
@settings(**SETTINGS)
def test_keyed_asof_constant_key_equals_global(
    spark, rows_l, rows_r, seed, direction, exact
):
    """VERDICT r15 Next #7: keyed merge_asof on a CONSTANT by-key and
    merge_asof_global share every tie-break/tolerance/exact-match
    contract, so on identical data they must agree row-for-row — one
    property pins seed-row regressions in either implementation."""
    from wukong_spark.operators.asof import merge_asof, merge_asof_global

    rng = np.random.default_rng(seed)
    lp = pd.DataFrame(
        {
            "t": np.sort(rng.integers(0, 50, rows_l)).astype(np.int64),
            "lid": np.arange(rows_l, dtype=np.int64),
        }
    )
    rp = pd.DataFrame(
        {
            "t": np.sort(rng.integers(0, 50, rows_r)).astype(np.int64),
            "rv": rng.integers(0, 1000, rows_r).astype(np.int64),
        }
    )
    ldf = spark.createDataFrame(lp)
    rdf = (
        spark.createDataFrame(rp)
        if rows_r
        else spark.createDataFrame([], "t long, rv long")
    )
    got_g = (
        merge_asof_global(
            ldf, rdf, on="t", direction=direction,
            allow_exact_matches=exact, n_partitions=5,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    got_k = (
        merge_asof(
            ldf.withColumn("k", F.lit(1)),
            rdf.withColumn("k", F.lit(1)),
            on="t", by="k", direction=direction, allow_exact_matches=exact,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    for c in ("r_t", "r_rv"):
        gv = got_g[c].astype("float64")
        kv = got_k[c].astype("float64")
        assert ((gv == kv) | (gv.isna() & kv.isna())).all(), (
            c, pd.concat([got_g, got_k.add_prefix("k_")], axis=1)
        )


def test_merge_asof_global_empty_sides(spark):
    """merge_asof_global edge contract: empty left → empty result with
    the full output schema; empty right → every left row kept with NULL
    match columns (left-join semantics), any direction."""
    from wukong_spark.operators.asof import merge_asof_global

    l0 = spark.createDataFrame([], "t long, lid long")
    r1 = spark.createDataFrame([(1, 5.0)], "t long, px double")
    out = merge_asof_global(l0, r1, on="t")
    assert out.columns == ["t", "lid", "r_t", "r_px"] and out.count() == 0

    l1 = spark.createDataFrame([(3, 0)], "t long, lid long")
    r0 = spark.createDataFrame([], "t long, px double")
    for direction in ("backward", "forward", "nearest"):
        row = merge_asof_global(l1, r0, on="t", direction=direction).collect()
        assert [tuple(r) for r in row] == [(3, 0, None, None)], (direction, row)


def test_global_scan_timestamp_running_max(spark):
    """global_scan over a TIMESTAMP value column (running latest-seen
    event time — the watermark/bookkeeping shape): datetime64 takes the
    strict maximum.accumulate path and the prefix fold compares
    datetimes on the driver; output dtype preserved."""
    from pyspark.sql.window import Window

    from wukong_spark.operators.setindex import global_scan

    rng = np.random.default_rng(3)
    base = pd.Timestamp("2024-05-01")
    pdf = pd.DataFrame(
        {
            "k": np.arange(150, dtype=np.int64),
            "ev": base + pd.to_timedelta(rng.integers(0, 9000, 150), "s"),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        global_scan(df, "ev", "k", op="max", n_partitions=6, out_col="m")
        .toPandas()
        .sort_values("k")["m"]
        .to_numpy()
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.select("k", F.max("ev").over(w).alias("m"))
        .toPandas()
        .sort_values("k")["m"]
        .to_numpy()
    )
    assert (got == want).all()
