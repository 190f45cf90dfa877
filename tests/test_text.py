

def test_repetition_stats(spark):
    """Gopher repetition metrics: duplicate-line fractions and the
    deterministic top word 2-gram."""
    from awskinesisconsumer_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # top 2-gram 'spam spam' x3
            (2, "aa\nbb\naa\naa"),               # 2 dup lines of 4
            (3, ""),                              # empty doc
            (4, "one two"),                       # single gram, no dups
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(
        docs, id_col="doc_id", text_col="text"
    ).collect()}
    assert out[1].top_2gram == "spam spam"
    # 3 overlapping occurrences x 9 chars / 19 chars = 1.42, clamped to 1.0
    assert out[1].top_2gram_char_frac == 1.0
    assert out[1].dup_line_frac == 0.0
    assert out[2].n_lines == 4 and out[2].dup_line_frac == 0.5
    # dup chars = 2x'aa' of total 2+2+2+2=8 line chars
    assert out[2].dup_line_char_frac == 0.5
    assert out[3].n_lines == 1 and out[3].top_2gram == ""
    assert out[3].dup_line_char_frac == 0.0 and out[3].top_2gram_char_frac == 0.0
    assert out[4].top_2gram == "one two" and out[4].top_2gram_char_frac == 1.0
