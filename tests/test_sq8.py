"""SQ8 scalar quantization vs a pure-Python oracle + twins."""

from pyspark.sql import functions as F

from llm_scraper_spark.operators import sq8
from llm_scraper_spark.operators.similarity import DIM, _quantized

SF_DIR = "/root/testdata/sf0.001"


def _py_sq8(rows):
    """rows = {vec_id: [int]*DIM}; returns (codes, recon) dicts."""
    L = sq8.SQ_LEVELS
    mn = [min(v[d] for v in rows.values()) for d in range(DIM)]
    mx = [max(v[d] for v in rows.values()) for d in range(DIM)]
    codes, recon = {}, {}
    for vid, v in rows.items():
        cs, rs = [], []
        for d in range(DIM):
            r = mx[d] - mn[d]
            c = 0 if r == 0 else max(0, min(L, (v[d] - mn[d]) * L // r))
            cs.append(c)
            rs.append(mn[d] + (0 if r == 0 else c * r // L))
        codes[vid], recon[vid] = cs, rs
    return mn, mx, codes, recon


def test_sq8_encode_matches_python_oracle(spark):
    vecs = _quantized(spark, SF_DIR).limit(50)
    rows = {r.vec_id: list(r.qe) for r in vecs.collect()}
    mn, mx, codes, recon = _py_sq8(rows)
    mn_sql, mx_sql = sq8._param_arrays(
        [{"d": d, "mn": mn[d], "mx": mx[d]} for d in range(DIM)]
    )
    got = {
        r.vec_id: (list(r.codes), list(r.recon))
        for r in sq8.sq8_encode(vecs, mn_sql, mx_sql).collect()
    }
    assert got == {v: (codes[v], recon[v]) for v in rows}


def test_sq8_codes_fit_one_byte(spark):
    vecs, enc = sq8._trained(spark, SF_DIR)
    stats = enc.selectExpr(
        "aggregate(codes, 0L, (a, c) -> if(c < 0 or c > 255, a + 1, a))"
        " AS oob"
    ).agg(F.sum("oob").alias("oob")).collect()[0]
    assert stats.oob == 0


def test_sq8_extremes_reconstruct_near_exactly(spark):
    """Coordinates at the per-dim min reconstruct exactly (code 0 →
    mn); at the max within one quantization step (255·r div 255 ≤ r)."""
    hand = {
        0: [0] * DIM,
        1: [1000] * DIM,
        2: [250] * DIM,
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in hand.items()], "vec_id long, qe array<long>"
    )
    mn_sql, mx_sql = sq8._param_arrays(
        [{"d": d, "mn": 0, "mx": 1000} for d in range(DIM)]
    )
    got = {r.vec_id: list(r.recon) for r in sq8.sq8_encode(df, mn_sql, mx_sql).collect()}
    assert got[0] == [0] * DIM
    assert all(1000 - r <= 1000 // sq8.SQ_LEVELS + 1 for r in got[1])


def test_sq8_oracles_match(spark):
    from tests.oracle_check import assert_matches

    for key in ("sq8_train_params", "sq8_recon_error", "ann_sq8_topk"):
        assert_matches(
            sq8.QUERIES[key](spark, SF_DIR), sq8.ORACLE_SQL[key], SF_DIR, key
        )
