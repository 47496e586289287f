"""Value pin for bpe_train_merges: the distributed trainer must reproduce,
rule for rule, an independent pure-Python BPE run on the same word counts
(extracted via DuckDB, so the pin never touches the Spark tokenizer)."""

from __future__ import annotations

import duckdb

from emr_flink_example_spark.operators.textstats import (
    BPE_END,
    N_BPE_MERGES,
    TOKEN_RE,
    q_bpe_train_merges,
)

SF_DIR = "/root/testdata/sf0.001"


def _python_bpe(word_freqs: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich et al. 2016), greedy left-to-right apply,
    lexicographic (p1, p2) tie-break on equal pair frequency."""
    vocab = {tuple(list(w) + [BPE_END]): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        pair_freq: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + f
        if not pair_freq:
            break
        (p1, p2), freq = min(
            pair_freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, p1, p2, p1 + p2, freq))
        new_vocab = {}
        for syms, f in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == p1 and s == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_merges_match_pure_python_reference(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT word, count(*)::BIGINT FROM (
            SELECT unnest(regexp_extract_all(text, '{TOKEN_RE}')) AS word
            FROM '{SF_DIR}/documents.parquet'
        ) GROUP BY word
        """
    ).fetchall()
    con.close()
    expected = _python_bpe(dict(rows), N_BPE_MERGES)

    got = [
        (r["rank"], r["p1"], r["p2"], r["merged"], r["pair_freq"])
        for r in q_bpe_train_merges(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expected
    # the learned rules are non-degenerate: N distinct rules, multi-char
    # symbols appear once earlier merges feed later ones
    assert len(got) == N_BPE_MERGES
    assert len({m[3] for m in got}) == N_BPE_MERGES
