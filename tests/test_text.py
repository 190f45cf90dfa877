

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


def test_redact_pii(spark):
    """Typed PII tokens replace matches; per-category counts agree with
    the tokens in the redacted output (category i counted after
    categories 0..i-1 were redacted); pattern order keeps the email
    intact from the phone/ip rules."""
    from awskinesisconsumer_spark.operators.text import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b-c_99@sub.example.org now"),
            (2, "host 10.0.255.7 and phone 415-555-0199"),
            (3, "ssn 123-45-6789 twice 123-45-0000"),
            (4, None),
            (5, "no pii here"),
            # phone-shaped run inside an email local part: the email
            # rule consumes it, so it must count as email ONLY — the
            # output shows one <EMAIL> and no <PHONE>.
            (6, "ping a.415-555-0199@x.io ok"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in redact_pii(docs, text_col="text").collect()}
    assert out[1].redacted == "mail <EMAIL> now" and out[1].n_email == 1
    assert out[2].redacted == "host <IP> and phone <PHONE>"
    assert out[2].n_ip == 1 and out[2].n_phone == 1 and out[2].n_email == 0
    assert out[3].redacted == "ssn <SSN> twice <SSN>" and out[3].n_ssn == 2
    # SSNs must NOT double-count as phones (3-2-4 != 3-3-4 grouping)
    assert out[3].n_phone == 0
    assert out[4].redacted == "" and out[4].n_email == 0
    assert out[5].redacted == "no pii here"
    assert out[6].redacted == "ping <EMAIL> ok"
    assert out[6].n_email == 1 and out[6].n_phone == 0


def test_tfidf_top_terms(spark):
    """Smoothed TF-IDF: corpus-wide terms score ln(1)+1 = tf, rarer
    terms higher; deterministic (score DESC, term ASC) ranking."""
    import math

    from awskinesisconsumer_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple cherry"),
            (3, "apple banana date date"),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_top_terms(docs, id_col="doc_id", text_col="text", k=2)
    rows = {(r.doc_id, r.term_rank): r for r in out.collect()}
    idf = lambda df_t: math.log(4 / (df_t + 1)) + 1
    # doc 1: apple tf=2 but df=3 (idf=1.0) -> 2.0; banana tf=1 df=2 -> 1.2877
    assert rows[(1, 1)].term == "apple"
    assert rows[(1, 1)].score == round(2 * idf(3), 4)
    assert rows[(1, 2)].term == "banana"
    # doc 3: date tf=2 df=1 -> top
    assert rows[(3, 1)].term == "date"
    assert rows[(3, 1)].score == round(2 * idf(1), 4)
    assert {r.term_rank for r in out.collect()} == {1, 2}


def test_top_terms_ranking(spark):
    from awskinesisconsumer_spark.operators.text import top_terms

    docs = spark.createDataFrame(
        [(1, "b a a"), (2, "A c b"), (3, None)],
        "doc_id bigint, text string",
    )
    rows = top_terms(docs, text_col="text", k=2).collect()
    # 'a' appears 3x (case-folded), 'b' 2x; ties would break term-ASC
    assert [(r.term, r.n, r.rank) for r in rows] == [("a", 3, 1), ("b", 2, 2)]


def test_bpe_train_merges_learns_the_dominant_pair(spark):
    from awskinesisconsumer_spark.operators.text import bpe_train_merges

    # 'aaab' x 30, 'ab' x 10: the dominant adjacent pair is (a, a).
    docs = spark.createDataFrame(
        [(i, " ".join(["aaab"] * 3)) for i in range(10)]
        + [(100 + i, "ab") for i in range(10)],
        "doc_id long, text string",
    )
    merges = bpe_train_merges(docs, text_col="text", n_merges=3).collect()
    assert [m.rank for m in merges] == list(range(len(merges)))
    first = merges[0]
    assert (first.left, first.right) == ("a", "a")
    # 'aaab' has two (a,a) occurrences per word... overlapping pairs
    # both counted at count time; weight = word freq.
    assert first.pair_count >= 30
    # Later merges build on merged symbols (e.g. 'aa' + 'b' or
    # 'aa' + 'a...') — no merge may repeat an identical pair.
    assert len({(m.left, m.right) for m in merges}) == len(merges)


def test_bpe_driver_and_distributed_paths_agree(spark):
    # The adaptive small-vocab driver loop must reproduce the
    # distributed rounds exactly (same pair counts, same
    # (c DESC, l, r) argmax, same greedy apply).
    from awskinesisconsumer_spark.operators.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(i, "lower lowest low newer newest wide wider")
         for i in range(4)],
        "doc_id long, text string",
    )
    drv = [tuple(r) for r in bpe_train_merges(
        docs, text_col="text", n_merges=6
    ).orderBy("rank").collect()]
    dist = [tuple(r) for r in bpe_train_merges(
        docs, text_col="text", n_merges=6, driver_vocab_limit=0
    ).orderBy("rank").collect()]
    assert drv == dist and len(drv) == 6


def test_bpe_merges_respect_word_boundary(spark):
    from awskinesisconsumer_spark.operators.text import bpe_train_merges

    # 'x y' repeated: the only within-word pairs involve the </w>
    # marker; ('y', 'x') must NEVER merge across the space.
    docs = spark.createDataFrame(
        [(i, "x y x y x y") for i in range(5)], "doc_id long, text string"
    )
    merges = bpe_train_merges(docs, text_col="text", n_merges=2).collect()
    assert all(not (m.left == "y" and m.right == "x") for m in merges)
    assert all("</w>" in (m.left + m.right) for m in merges)
