"""Independent (pure-Python) oracles for the packing module and the
planted-dup recall contract of SemDeDup — confidence beyond the DuckDB
twins, which share SQL-engine semantics with Spark."""

import math

import pyarrow.parquet as pq
import pytest

from llm_scraper_spark.operators import packing, similarity

SF = "/root/testdata/sf0.001"


def _docs_rows():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _segments(text):
    ws = text.split(" ")
    w = packing.SEG_W
    return [" ".join(ws[i * w : i * w + w]) for i in range(math.ceil(len(ws) / w))]


def test_para_dedup_matches_pure_python(spark):
    expected = {}
    seen = set()
    for doc_id, text in _docs_rows():  # doc_id order = first-wins order
        segs = _segments(text)
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        expected[doc_id] = (len(segs), len(kept), " ".join(kept))
    got = packing.para_dedup(spark, SF).collect()
    assert len(got) == len(expected)
    for r in got:
        e = expected[r["doc_id"]]
        assert (r["n_paras"], r["n_kept"], r["clean_text"]) == e
    # the corpus must contain real cross-doc repeats for this test to
    # exercise anything
    assert any(r["n_kept"] < r["n_paras"] for r in got)


def test_pack_sequences_matches_pure_python(spark):
    cum = 0
    expected = {}
    for doc_id, text in _docs_rows():
        tok = len(text.split(" "))
        start = cum
        cum += tok
        expected[doc_id] = (
            tok,
            start,
            start // packing.CTX,
            (cum - 1) // packing.CTX,
            start % packing.CTX,
        )
    got = packing.pack_sequences(spark, SF).collect()
    assert len(got) == len(expected)
    for r in got:
        assert (
            r["n_tokens"],
            r["tok_start"],
            r["start_bin"],
            r["end_bin"],
            r["bin_offset"],
        ) == expected[r["doc_id"]]


def test_pack_two_phase_scan_equals_global_on_skewed_ids(spark, tmp_path):
    """Bucketing by contiguous doc_id ranges must reproduce the global
    prefix-sum even when ids are sparse and skewed into few buckets."""
    ids = [0, 1, 2, 3, 1000, 1001, 999999, 1000000]
    rows = [(i, "w " * (i % 7 + 1)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r["tok_start"]
        for r in packing.pack_sequences(spark, str(tmp_path)).collect()
    }
    cum = 0
    for i in ids:
        tok = len(("w " * (i % 7 + 1)).split(" "))
        assert got[i] == cum
        cum += tok


def test_semdedup_drops_planted_copies(spark):
    rows = similarity.semdedup(spark, SF).collect()
    base = [r for r in rows if r["vec_id"] < 100000]
    exact = [r for r in rows if 100000 <= r["vec_id"] < 200000]
    pert = [r for r in rows if r["vec_id"] >= 200000]
    assert exact and pert
    # an exact copy shares its original's cell and has cosine 1 with a
    # strictly lower id — ALL must be dropped
    assert all(r["kept"] == 0 for r in exact)
    # the one-component perturbation leaves cosine ≈ 1; a copy only
    # survives if the perturbation flips its cell assignment (rare)
    assert sum(r["kept"] for r in pert) <= len(pert) // 5
    # dedup must not nuke the base corpus
    kept_base = sum(r["kept"] for r in base)
    assert kept_base >= len(base) * 0.5


def test_semdedup_drop_has_lower_id_witness_in_cell(spark):
    """Every dropped vector has a lower-id cell-mate with cosine ≥
    threshold — checked against the raw vectors, independent of the
    join that produced the drop."""
    rows = similarity.semdedup(spark, SF).collect()
    cell = {r["vec_id"]: r["cell"] for r in rows}
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = {
        v: [math.floor(x * 1000) for x in e]
        for v, e in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }
    vecs = dict(q)
    for v, e in q.items():
        if v % 13 == 0:
            vecs[v + 100000] = e
        if v % 9 == 0:
            vecs[v + 200000] = [e[0] + 1] + e[1:]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    dropped = [r["vec_id"] for r in rows if r["kept"] == 0]
    assert dropped
    for v in dropped:
        mates = [u for u in vecs if u < v and cell[u] == cell[v]]
        assert any(
            cos(vecs[u], vecs[v]) >= similarity.SEMDEDUP_COS for u in mates
        ), f"no witness for dropped vec {v}"


def test_chunk_documents_covers_every_token(spark, tmp_path):
    """Window/stride invariants: chunks tile the doc with the declared
    overlap, cover every token, and short docs emit one whole chunk."""
    rows = [
        (1, " ".join(f"t{i}" for i in range(100))),
        (2, "one two three"),  # shorter than a window
        (3, " ".join(f"u{i}" for i in range(packing.CHUNK_TOKENS))),  # exact fit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = packing.chunk_documents(spark, str(tmp_path)).collect()
    stride = packing.CHUNK_TOKENS - packing.CHUNK_OVERLAP
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        ws = text.split(" ")
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        rebuilt = []
        for k, r in enumerate(chunks):
            toks = r["chunk_text"].split(" ")
            assert r["n_tokens"] == len(toks)
            assert toks == ws[k * stride : k * stride + packing.CHUNK_TOKENS]
            rebuilt.extend(toks if k == 0 else toks[packing.CHUNK_OVERLAP :])
        if len(chunks) == 1:
            assert rebuilt == ws
        else:
            # full coverage: the last window reaches the final token
            assert chunks[-1]["chunk_text"].split(" ")[-1] == ws[-1]
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 1


def test_lang_sampling_weights_flatten_the_head(spark):
    import math

    rows = {r["lang"]: r for r in
            __import__("llm_scraper_spark.operators.curation",
                       fromlist=["curation"]).lang_sampling_weights(spark, SF).collect()}
    assert len(rows) >= 2
    total_w = sum(r["weight_fp"] for r in rows.values())
    for lang, r in rows.items():
        assert r["weight_fp"] == math.floor(math.sqrt(r["n_docs"]) * 1_000_000)
        assert r["share_ppm"] == r["weight_fp"] * 1_000_000 // total_w
    # temperature flattening: weight share of the head language must be
    # strictly below its doc share
    head = max(rows.values(), key=lambda r: r["n_docs"])
    n_total = sum(r["n_docs"] for r in rows.values())
    assert head["share_ppm"] / 1e6 < head["n_docs"] / n_total


@pytest.mark.parametrize(
    "key",
    ["para_dedup", "pack_sequences", "semdedup", "chunk_documents",
     "lang_sampling_weights", "contrastive_negatives",
     "bpe_merge_topk", "bpe_train_merges"],
)
def test_new_keys_registered(key):
    import __spark_entry__ as entry

    assert key in entry.queries()
    assert key in entry.oracle_sql()


def test_contrastive_negatives_matches_pure_python(spark):
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    )
    src = dict(zip(t["doc_id"].to_pylist(), t["source"].to_pylist()))
    n = max(src) + 1
    expected = []
    for a in sorted(src):
        for j in range(1, packing.NEG_K + 1):
            neg = (a * packing.NEG_A + j * packing.NEG_B) % n
            if neg != a and src[neg] != src[a]:
                expected.append((a, src[a], neg, src[neg]))
    expected.sort()
    got = [
        (r["doc_id"], r["anchor_source"], r["neg_id"], r["neg_source"])
        for r in packing.contrastive_negatives(spark, SF).collect()
    ]
    assert sorted(got) == expected
    assert len(expected) > 0


def test_contrastive_negatives_guards_fire(spark, tmp_path):
    # 3 docs, 2 sources: id 0 draws (0*A + j*B) % 3 = 16807*j % 3 =
    # j % 3, so j=3 is a SELF hit; and doc 1 vs doc 0 share source sA,
    # so same-source candidates must drop too.
    d = tmp_path / "sf"
    d.mkdir()
    rows = [(0, "t", "en", "sA", 1), (1, "t", "en", "sA", 1),
            (2, "t", "en", "sB", 1)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    src = {0: "sA", 1: "sA", 2: "sB"}
    expected = sorted(
        (a, src[a], (a * packing.NEG_A + j * packing.NEG_B) % 3,
         src[(a * packing.NEG_A + j * packing.NEG_B) % 3])
        for a in src for j in range(1, packing.NEG_K + 1)
        if (a * packing.NEG_A + j * packing.NEG_B) % 3 != a
        and src[(a * packing.NEG_A + j * packing.NEG_B) % 3] != src[a]
    )
    got = sorted(
        (r["doc_id"], r["anchor_source"], r["neg_id"], r["neg_source"])
        for r in packing.contrastive_negatives(spark, str(d)).collect()
    )
    assert got == expected
    drawn = 3 * packing.NEG_K
    assert 0 < len(got) < drawn  # both guards actually dropped rows


def _py_shuffle_summary():
    import hashlib

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    P1, P2, P3 = packing._CK_P1, packing._CK_P2, packing._CK_P3
    agg = {}
    for did, nc in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()):
        key = int(hashlib.md5(f"shuf:{did}".encode()).hexdigest()[:15], 16)
        s = key % packing.N_SHARDS
        a = agg.setdefault(s, [0, 0, None, None, 0, 0])
        a[0] += 1
        a[1] += nc
        a[2] = key if a[2] is None else min(a[2], key)
        a[3] = key if a[3] is None else max(a[3], key)
        a[4] += key % P1
        a[5] += (key % P2) * (did % P3)
    return agg


def test_global_shuffle_shards_matches_pure_python(spark):
    expected = _py_shuffle_summary()
    got = {
        r["shard"]: [
            r["n_docs"], r["n_chars"], r["min_key"], r["max_key"],
            r["key_sum"], r["pair_sum"],
        ]
        for r in packing.global_shuffle_shards(spark, SF).collect()
    }
    assert got == expected


def test_global_shuffle_shards_are_balanced(spark):
    # uniform md5 keys -> even shards by construction; at 500 docs /
    # 16 shards allow generous binomial wobble but no hot shard
    rows = packing.global_shuffle_shards(spark, SF).collect()
    sizes = [r["n_docs"] for r in rows]
    assert len(sizes) == packing.N_SHARDS
    assert max(sizes) <= 3 * max(1, min(sizes))
