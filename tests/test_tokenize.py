"""BPE tokenizer: engine == independent scalar oracle token-by-token,
exact detokenize round trip, unknown handling, committed-spec
reproducibility, and the raw-text -> ids -> pack_sequences composition."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SPEC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lazyosm_spark",
    "resources",
    "bpe_merges.json",
)


def _spec():
    from tests.oracle import bpe_ref

    return bpe_ref.load_spec(SPEC_PATH)


def test_tokenize_matches_scalar_oracle(spark):
    """Every doc's FULL id sequence equals the independent scalar BPE
    (classic sequential-replacement vs the engine's lowest-rank-pair
    contraction — equivalent formulations, different code)."""
    from tests.oracle import bpe_ref

    from lazyosm_spark.operators.tokenize import tokenize

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r["doc_id"]: list(r["token_ids"]) for r in tokenize(docs).collect()}
    spec = _spec()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert len(got) == len(texts) > 0
    for doc_id, text in texts.items():
        assert got[doc_id] == bpe_ref.encode(text, spec), doc_id


def test_tokenize_edge_whitespace_matches_oracle(spark):
    """Docs with leading/trailing \\n or \\t (common: newline-terminated
    files) must encode identically to the scalar oracle's str.strip
    semantics — the ADVICE r5 phantom-''-word fix: normalize_text trims
    spaces only, so edge whitespace used to leave an edge space whose
    split emitted a bare end-of-word token.  Also pins out-of-range ids
    decoding to the literal '<unk>' instead of wrapping/IndexError."""
    from tests.oracle import bpe_ref

    from lazyosm_spark.operators.tokenize import detokenize, tokenize

    docs = spark.createDataFrame(
        [
            (1, "hello\n"),
            (2, "\tworld trailing\t\n"),
            (3, "\n\nonly newlines\n"),
            (4, " padded with spaces "),
            (5, "\n"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: list(r["token_ids"]) for r in tokenize(docs).collect()}
    spec = _spec()
    for doc_id, text in [(r["doc_id"], r["text"]) for r in docs.collect()]:
        assert got[doc_id] == bpe_ref.encode(text, spec), (doc_id, got[doc_id])

    bad = spark.createDataFrame(
        [(1, [72, -1, 9_999_999])], "doc_id long, token_ids array<int>"
    )
    out = detokenize(bad).collect()[0]["text"]
    assert out == "h<unk><unk>", out


def test_detokenize_round_trip(spark):
    """detokenize(tokenize(text)) == normalized text, byte-identical,
    for the whole fixture corpus (printable-ASCII alphabet)."""
    from lazyosm_spark.operators.dedup import normalize_text
    from lazyosm_spark.operators.tokenize import detokenize, tokenize

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rt = detokenize(tokenize(docs)).select("doc_id", "text")
    want = docs.select("doc_id", normalize_text("text").alias("text"))
    diff = rt.exceptAll(want).count() + want.exceptAll(rt).count()
    assert diff == 0


def test_unseen_ascii_word_falls_back_to_chars(spark):
    """A word absent from training still tokenizes losslessly via the
    printable-ASCII base alphabet (and round-trips)."""
    from lazyosm_spark.operators.tokenize import UNK_ID, detokenize, tokenize

    docs = spark.createDataFrame([(1, "zebra Quokka!  42")], "doc_id long, text string")
    t = tokenize(docs)
    row = detokenize(t).select("text", "token_ids").first()
    assert row["text"] == "zebra quokka! 42"
    assert UNK_ID not in list(row["token_ids"])


def test_non_ascii_char_maps_to_unk(spark):
    from lazyosm_spark.operators.tokenize import UNK_ID, detokenize, tokenize

    docs = spark.createDataFrame([(1, "café")], "doc_id long, text string")
    t = tokenize(docs)
    row = detokenize(t).select("text", "token_ids").first()
    assert UNK_ID in list(row["token_ids"])
    assert "<unk>" in row["text"]


def test_committed_spec_reproducible():
    """Re-training on the fixture corpus reproduces the committed
    merges table exactly (trainer determinism = the spec is an
    artifact of the corpus, not of a run)."""
    import pandas as pd

    from tools.train_bpe import BASE, END_WORD, train, word_freqs

    texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])["text"]
    merges = train(word_freqs(texts), 512)
    spec = json.load(open(SPEC_PATH))
    assert [list(m) for m in merges] == spec["merges"]
    assert spec["tokens"] == ["<unk>"] + BASE + [END_WORD] + [a + b for a, b in merges]


def test_distributed_word_counts_match_trainer(spark):
    """The at-scale vocab path: operators.tokenize.word_counts
    (distributed groupBy) produces the EXACT word-frequency dict the
    trainer's scalar word_freqs computes — so --from-spark training
    reproduces the committed spec byte-for-byte."""
    import pandas as pd

    from lazyosm_spark.operators.tokenize import word_counts
    from tools.train_bpe import train, word_freqs

    texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])["text"]
    scalar = word_freqs(texts)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dist = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    assert dist == scalar
    # whitespace edges: counts agree where the naive split would differ
    edge = spark.createDataFrame(
        [(1, "Foo  bar\n"), (2, "\tfoo BAR"), (3, "\n \t")],
        "doc_id int, text string",
    )
    got = {r["word"]: r["cnt"] for r in word_counts(edge).collect()}
    assert got == {"foo": 2, "bar": 2}
    merges = train(dist, 512)
    spec = json.load(open(SPEC_PATH))
    assert [list(m) for m in merges] == spec["merges"]


def test_tokenize_pack_composition(spark):
    """Raw text -> token ids -> packed sequences end-to-end: packing
    conserves the token stream (chunk count, offsets in range)."""
    from lazyosm_spark.operators.packing import pack_sequences
    from lazyosm_spark.operators.tokenize import tokenize

    ctx = 64
    toks = tokenize(spark.read.parquet(f"{SF}/documents.parquet")).select(
        "doc_id", "n_tokens"
    )
    total = toks.agg(F.sum("n_tokens")).first()[0]
    packed = pack_sequences(toks, ctx_len=ctx)
    assert packed.count() == toks.count()
    stats = packed.agg(
        # seq_id holds the doc's FIRST token; the stream's last chunk is
        # the furthest any doc SPANS, not the max first-token seq
        F.max(F.col("seq_id") + F.col("n_seqs_spanned") - 1).alias("last_seq"),
        F.max("offset").alias("max_off"),
        F.min("offset").alias("min_off"),
    ).first()
    assert stats["last_seq"] == (total - 1) // ctx
    assert 0 <= stats["min_off"] and stats["max_off"] < ctx


def test_literal_marker_text_round_trips(spark):
    """The end-of-word sentinel is non-ASCII (U+2581), so text that
    literally contains '</w>'-style ASCII sequences — or any printable
    ASCII — round-trips byte-exactly (the code-review regression:
    an ASCII marker string was corrupted by detokenize's replace)."""
    from lazyosm_spark.operators.tokenize import detokenize, tokenize

    docs = spark.createDataFrame(
        [(1, "a </w> b <unk> c"), (2, "x _ y __ z")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in detokenize(tokenize(docs)).collect()}
    assert got == {1: "a </w> b <unk> c", 2: "x _ y __ z"}
