"""Byte-identical extracted text per url: Spark pandas-UDF vs the pinned
pure-Python reference extractor (input_hint invariant)."""

from __future__ import annotations

from isp_trace_parser_spark import synth
from isp_trace_parser_spark.functions.extract import (
    extract_text_reference,
    language_id,
    with_extracted_text,
)


def test_extractor_recovers_synth_text(spark):
    df = synth.pages(spark, n_urls=6, n_slots=24)
    out = with_extracted_text(df).select("url", "text", "extracted_text").toPandas()
    mismatches = out[out["text"] != out["extracted_text"]]
    assert mismatches.empty, mismatches.head()


def test_udf_byte_identical_to_reference(spark):
    pdf = synth.pages_pandas(n_urls=4, n_slots=8).reset_index()
    sdf = spark.createDataFrame(pdf[["index", "url", "html"]])
    got = (
        with_extracted_text(sdf)
        .select("index", "extracted_text")
        .toPandas()
        .sort_values("index")
        .reset_index(drop=True)
    )
    expect = [extract_text_reference(h) for h in pdf["html"]]
    for t, e in zip(got["extracted_text"], expect):
        assert t.encode() == e.encode()


def test_series_extractor_byte_identical_adversarial():
    """The vectorized Series pipeline vs the per-row reference on inputs
    chosen to break the block-strip/empty-drop equivalences: unicode
    whitespace (strip() semantics), empty blocks, entity ordering,
    leading/trailing separators."""
    import pandas as pd

    from isp_trace_parser_spark.functions.extract import _extract_series

    cases = [
        "",
        "<p></p><p> </p><p> </p>",                 # all-empty blocks
        "<p> lead nbsp</p>",                        # strip() unicode ws
        "<p> em space </p>",              # more unicode ws
        "<p>a&amp;lt;b</p>",                             # &amp; decoded last
        "<p>&nbsp;&nbsp;x</p>",                          # entity -> space -> strip
        "<p>&&amp;amp;</p>",                             # no rescan of output
        "<p>&amp;nbsp;</p>",                             # & must not re-seed nbsp
        "<p>&amp;&lt;&gt;&quot;&#39;&nbsp;</p>",         # all entities adjacent
        "<br><br><p>x</p><br>",                          # separator runs at ends
        "<div>a<div>b</div></div>no tag tail",
        "<P>upper CASE tags</P><LI>item</LI>",
        "<script>drop<p>this</p></script><p>keep</p>",
        "<head><title>t</title></head><p>body</p>",
        "text\twith\ttabs\r\nand crlf",
        "<p>mid block nbsp stays</p>",
        "a\x1c\x1d\x1e\x1f b",                           # isspace() control chars
        "<p>" + " " * 50 + "</p><p>y</p>",
    ]
    got = _extract_series(pd.Series(cases))
    for inp, g in zip(cases, got):
        e = extract_text_reference(inp)
        assert g.encode() == e.encode(), repr(inp)
    # bytes input path
    got_b = _extract_series(pd.Series([c.encode() for c in cases]))
    for inp, g in zip(cases, got_b):
        assert g.encode() == extract_text_reference(inp.encode()).encode()


def test_reference_extractor_edge_cases():
    assert extract_text_reference(b"<p>a&amp;b</p><p> two  words </p>") == "a&b\n\ntwo words"
    assert extract_text_reference("<script>var x=1;</script><p>ok</p>") == "ok"
    assert extract_text_reference("<html><body>bare text</body></html>") == "bare text"
    assert extract_text_reference("") == ""


def test_language_id_heuristic(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "text": [
                "the cat is in the house and happy",
                "der hund ist nicht hier und laut",
                "le chat est dans une maison",
                "el perro es una mascota que ladra",
                "zzz qqq xxx",
            ]
        }
    )
    out = (
        spark.createDataFrame(pdf)
        .select(language_id("text").alias("lang"))
        .toPandas()["lang"]
        .tolist()
    )
    assert out == ["en", "de", "fr", "es", "und"]


def test_json_metadata_typed_and_fail_safe(spark):
    """from_json parses once into a typed struct; malformed JSON yields
    NULL fields (PERMISSIVE), never a scan failure."""
    import pandas as pd
    from pyspark.sql import functions as F

    from isp_trace_parser_spark.functions.extract import json_metadata

    df = spark.createDataFrame(
        pd.DataFrame({"props": ['{"k": 7, "tag": "a"}', "not json", None]})
    )
    out = df.select(
        json_metadata(F.col("props"), "k INT, tag STRING").alias("m")
    ).select("m.k", "m.tag").toPandas()
    assert out.iloc[0]["k"] == 7 and out.iloc[0]["tag"] == "a"
    assert pd.isna(out.iloc[1]["k"]) and pd.isna(out.iloc[2]["k"])


def test_pii_redaction_counts_and_placeholders(spark):
    import pandas as pd

    from isp_trace_parser_spark.functions.text import with_pii_redaction

    pdf = pd.DataFrame(
        {
            "text": [
                "mail a.b+c@site-x.co.uk or admin@h.io, call +4915123456789",
                "server at 192.168.0.1 and 10.0.0.255; no mail here",
                "overlap: x@1.2.3.4.com then bare 1.2.3.4",
                "clean text with + plus and @ at but no pii",
            ]
        }
    )
    out = with_pii_redaction(spark.createDataFrame(pdf)).toPandas()
    r = {t[:7]: row for t, row in zip(pdf["text"], out.itertuples())}
    assert r["mail a."].n_emails == 2 and r["mail a."].n_phones == 1
    assert "<EMAIL>" in r["mail a."].redacted_text
    assert "<PHONE>" in r["mail a."].redacted_text
    assert r["server "].n_ips == 2
    assert r["server "].redacted_text.count("<IP>") == 2
    # email wins the overlap (applied first), leftover bare IP redacted
    assert r["overlap"].n_emails == 1 and r["overlap"].n_ips >= 1
    assert r["clean t"].n_emails == 0
    assert r["clean t"].redacted_text == pdf["text"][3]


def test_repetition_filters_hand_computed(spark):
    import pandas as pd

    from isp_trace_parser_spark.functions.text import (
        dup_sentence_fraction,
        top_bigram_fraction,
    )
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "text": [
                # bigrams: "a b","b a","a b","b a","a b" -> top "a b" 3/5
                "a b a b a b",
                # all bigrams distinct -> 1/3
                "w x y z",
                # single token -> 0.0 by definition
                "solo",
                # sentences: s1. s2. s1 -> dup fraction 1 - 2/3
                "red fox. blue cat. red fox",
            ]
        }
    )
    df = spark.createDataFrame(pdf).select(
        "text",
        top_bigram_fraction(F.col("text")).alias("bf"),
        dup_sentence_fraction(F.col("text")).alias("sf"),
    )
    r = {row["text"][:4]: row for row in df.collect()}
    assert abs(r["a b "]["bf"] - 3 / 5) < 1e-12
    assert abs(r["w x "]["bf"] - 1 / 3) < 1e-12
    assert r["solo"]["bf"] == 0.0
    assert abs(r["red "]["sf"] - (1 - 2 / 3)) < 1e-12
    assert r["w x "]["sf"] == 0.0


def test_chunk_documents_windows_and_overlap(spark):
    import pandas as pd

    from isp_trace_parser_spark.functions.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(25))  # 25 tokens
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": [text, "short doc"]})
    out = (
        chunk_documents(
            spark.createDataFrame(pdf), chunk_tokens=10, overlap=4
        )
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d1 = out[out["doc_id"] == 1]
    # stride 6: starts 0,6,12,18,24 -> ceil((25-10)/6)+1 = 4? (25-10+5)//6+1
    # = 20//6+1 = 3+1 = 4 chunks, last covers tokens 18..24 (7 tokens)
    assert list(d1["chunk_id"]) == [0, 1, 2, 3]
    assert list(d1["chunk_n_tokens"]) == [10, 10, 10, 7]
    assert d1.iloc[0]["chunk_text"].split()[0] == "t0"
    assert d1.iloc[1]["chunk_text"].split()[0] == "t6"  # overlap of 4
    assert d1.iloc[3]["chunk_text"].split()[-1] == "t24"
    d2 = out[out["doc_id"] == 2]
    assert len(d2) == 1 and d2.iloc[0]["chunk_n_tokens"] == 2
