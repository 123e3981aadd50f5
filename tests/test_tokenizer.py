"""Independent pure-Python BPE oracle for the tokenizer module —
confidence beyond the DuckDB twin (which shares SQL ``replace``
semantics with Spark), plus the overlapping-pair greedy-merge edge
case the twin's corpus may never exercise."""

import re
from collections import Counter

import pyarrow.parquet as pq

from llm_scraper_spark.operators import tokenizer

SF = "/root/testdata/sf0.001"


def _py_word_freq(texts):
    wf = Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if len(w) >= 2:
                wf[w] += 1
    return wf


def _py_pair_counts(wf):
    pc = Counter()
    for w, f in wf.items():
        for i in range(len(w) - 1):
            pc[w[i : i + 2]] += f
    return pc


def _py_replace(w, pair, sym):
    # left-to-right non-overlapping, like str.replace / SQL replace
    return w.replace(pair, sym)


def _py_train(texts, n):
    wf = dict(_py_word_freq(texts))
    out = []
    for rnd in range(n):
        pc = _py_pair_counts(wf)
        if not pc:
            break
        pair = min(pc, key=lambda p: (-pc[p], p))
        out.append((rnd, pair, pc[pair]))
        sym = tokenizer.PLACEHOLDERS[rnd]
        wf2 = Counter()
        for w, f in wf.items():
            wf2[_py_replace(w, pair, sym)] += f
        wf = dict(wf2)
    return out


def _corpus_texts():
    return pq.read_table(
        f"{SF}/documents.parquet", columns=["text"]
    )["text"].to_pylist()


def test_bpe_merge_topk_matches_pure_python(spark):
    pc = _py_pair_counts(_py_word_freq(_corpus_texts()))
    expected = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = expected[: tokenizer.BPE_TOPK]
    got = [
        (r["pair"], r["merge_count"])
        for r in tokenizer.bpe_merge_topk(spark, SF).collect()
    ]
    assert got == expected


def test_bpe_train_merges_matches_pure_python(spark):
    expected = _py_train(_corpus_texts(), tokenizer.N_MERGES)
    got = [
        (r["merge_rank"], r["pair"], r["merge_count"])
        for r in tokenizer.bpe_train_merges(spark, SF).collect()
    ]
    assert got == expected
    assert len(got) == tokenizer.N_MERGES  # corpus never runs dry here


def test_overlapping_pair_merges_greedy_left_to_right(spark, tmp_path):
    # "aaaa" + merge "aa": greedy BPE tokenizes to [aa, aa] -> "00",
    # NOT [a, aa, a]; str.replace / SQL replace agree with greedy.
    d = tmp_path / "sf"
    d.mkdir()
    spark.createDataFrame(
        [(0, "aaaa aaaa aaa ab", "en", "s", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = [
        (r["merge_rank"], r["pair"], r["merge_count"])
        for r in tokenizer.bpe_train_merges(spark, str(d)).collect()
    ]
    expected = _py_train(["aaaa aaaa aaa ab"], tokenizer.N_MERGES)
    assert got == expected
    # round 1: "aa" wins (2+2+2+2+1+1? no: within-word adjacent pairs:
    # aaaa -> aa,aa,aa = 3 each ×2 words = 6; aaa -> 2; ab -> 1) = 8
    assert got[0] == (0, "aa", 8)
    # round 2 runs over the REWRITTEN vocab: aaaa->"00", aaa->"0a",
    # ab->"ab"; pairs: 00×2, 0a×1, ab×1
    assert got[1] == (1, "00", 2)


def _py_encode_summary(rows, merges):
    # rows: (source, text); returns {source: (n_words, n_chars, n_toks)}
    out = {}
    for source, text in rows:
        for w in re.split("[^a-z]+", text.lower()):
            if not w:
                continue
            e = w
            for rnd, pair in enumerate(merges):
                e = _py_replace(e, pair, tokenizer.PLACEHOLDERS[rnd])
            nw, nc, nt = out.get(source, (0, 0, 0))
            out[source] = (nw + 1, nc + len(w), nt + len(e))
    return out


def test_bpe_encode_summary_matches_pure_python(spark):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
    rows = list(zip(t["source"].to_pylist(), t["text"].to_pylist()))
    merges = [p for _, p, _ in _py_train([x for _, x in rows], tokenizer.N_MERGES)]
    expected = _py_encode_summary(rows, merges)
    got = {
        r["source"]: (r["n_words"], r["n_alpha_chars"], r["n_bpe_tokens"])
        for r in tokenizer.bpe_encode_summary(spark, SF).collect()
    }
    assert got == expected
    # every merge application saves exactly one symbol, so the encoded
    # stream is never longer than the raw one
    assert all(nt <= nc for _, nc, nt in got.values())
