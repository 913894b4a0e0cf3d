"""Unit tests for scalar text/json/time functions (SURVEY 5.3): edge
cases the reference's per-row code handles (processor.py:117-178)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from msg_vector_search_spark.functions import textops


def one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("out")).head()["out"]


def test_extract_text_object(spark):
    assert one(spark, textops.extract_text(F.col("c")),
               c='{"text": "hello"}') == "hello"


def test_extract_text_object_missing_key(spark):
    """A VALID object lacking $.text is raw passthrough: the reference's
    `"text" in data` guard fails and falls through to `return content`
    (processor.py:137-150) — not dict.get('text','') (r15 review)."""
    assert one(spark, textops.extract_text(F.col("c")), c='{"x": 1}') == '{"x": 1}'


def test_extract_text_null_text_value(spark):
    """DECIDED edge (VERDICT r15 item 5), claim matched to the
    reference line-for-line: on '{"text": null}' the reference's
    `"text" in data` guard is True so extract returns data['text'] =
    None (processor.py:137-138) — and the reference then CRASHES on
    its own output: clean_text does `re.sub(pattern, ' ', text)` on
    that None (processor.py:153->167, TypeError).  We deliberately
    pass the raw string through instead — identical to the reference
    on every input the reference survives, recoverable on the one
    shape where it aborts.  Same decision for the array twin."""
    assert one(spark, textops.extract_text(F.col("c")),
               c='{"text": null}') == '{"text": null}'
    # array twin: a null-text item is skipped exactly like a missing
    # key (from_json reads both as null)
    assert one(spark, textops.extract_text(F.col("c")),
               c='[{"text": null}, {"text": "b"}]') == "b"


def test_extract_text_array_item_missing_key_skipped(spark):
    """List items without "text" are skipped, not joined in as '' —
    the reference appends only `"text" in item` segments
    (processor.py:141-145), so no doubled separator."""
    assert one(spark, textops.extract_text(F.col("c")),
               c='[{"text": "a"}, {"n": 1}, {"text": "b"}]') == "a b"


def test_extract_text_array(spark):
    got = one(spark, textops.extract_text(F.col("c")),
              c='[{"text": "a"}, {"text": "b"}]')
    assert got == "a b"


def test_extract_text_raw_passthrough(spark):
    assert one(spark, textops.extract_text(F.col("c")),
               c="plain words") == "plain words"


def test_extract_text_malformed_array(spark):
    assert one(spark, textops.extract_text(F.col("c")),
               c="[not json") == "[not json"


def test_extract_text_type_gate(spark):
    got = one(spark,
              textops.extract_text(F.col("c"), F.col("t")),
              c='{"text": "hello"}', t=2)
    assert got is None


def test_clean_text_url_and_emoji(spark):
    got = one(spark, textops.clean_text(F.col("c")),
              c="see   https://x.co/a?b=1 now ✨ok✨")
    assert got == "see  now ok"


def test_clean_text_empty_and_whitespace(spark):
    assert one(spark, textops.clean_text(F.col("c")), c="   \t\n ") == ""


def test_clean_text_keeps_allowed_punct(spark):
    assert one(spark, textops.clean_text(F.col("c")),
               c="a, b! c? d; e: f-g 'h' \"i\".") == \
        "a, b! c? d; e: f-g 'h' \"i\"."


def test_fmt_human_time(spark):
    import datetime as dt
    got = one(spark, textops.fmt_human_time(F.col("ts")),
              ts=dt.datetime(2025, 7, 18, 15, 4, 0))
    assert got == "Jul 18, 2025 at 03:04 PM"


def test_conv_type(spark):
    assert one(spark, textops.conv_type_from_sid(F.col("s")),
               s="group-12") == "group"
    assert one(spark, textops.conv_type_from_sid(F.col("s")),
               s="buddy-9") == "private"


def test_truncate_ellipsis(spark):
    long = "x" * 150
    got = one(spark, textops.truncate_ellipsis(F.col("c")), c=long)
    assert got == "x" * 100 + "..."
    assert one(spark, textops.truncate_ellipsis(F.col("c")), c="short") == "short"


def test_name_from_email(spark):
    got = one(spark, textops.name_from_email(F.col("c")),
              c="User ID: 42 Email: jane.doe@shopee.com")
    assert got == "Jane Doe"
    assert one(spark, textops.name_from_email(F.col("c")), c="nope") is None


def test_user_id_from_content(spark):
    assert one(spark, textops.user_id_from_content(F.col("c")),
               c="User ID: 42 Email: a.b@shopee.com") == 42


def test_is_file_name(spark):
    for s, want in [("report.pdf", True), ("Screenshot 2024", True),
                    ("a/b/c", True), ("http://x", True), ("x", True),
                    ("Jane Doe", False)]:
        assert one(spark, textops.is_file_name(F.col("c")), c=s) is want, s


def test_group_name_probe_fallbacks(spark):
    assert one(spark, textops.group_name_probe(F.col("c")),
               c='{"n": "Team"}') == "Team"
    assert one(spark, textops.group_name_probe(F.col("c")),
               c='{"gn": "G2"}') == "G2"
    assert one(spark, textops.group_name_probe(F.col("c")),
               c='{"group_name": "G3"}') == "G3"
    # length guard: reject >= 100 chars
    assert one(spark, textops.group_name_probe(F.col("c")),
               c='{"n": "' + "x" * 120 + '"}') is None
    assert one(spark, textops.group_name_probe(F.col("c")),
               c='{"n": ""}') is None


# ---------------------------------------------------------------------------
# Gopher quality rules: the fixture corpus never exercises the
# bullet / ellipsis / symbol / short-word paths (no newlines, no '#',
# no '...'), so synthetic texts pin those rule branches here.
# ---------------------------------------------------------------------------

from msg_vector_search_spark.functions import analysis


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(text,)], ["text"])
    fl = analysis.gopher_flags(F.col("text"), **kw)
    row = df.select(*[c.alias(k) for k, c in fl.items()]).head()
    return row.asDict()


def test_gopher_bullet_lines_rule(spark):
    mostly_bullets = "\n".join(["- item %d" % i for i in range(10)])
    assert _flags(spark, mostly_bullets)["ok_bullet_lines"] is False
    mixed = "\n".join(["- item", "plain one", "plain two"])
    assert _flags(spark, mixed)["ok_bullet_lines"] is True


def test_gopher_ellipsis_lines_rule(spark):
    trailing = "\n".join(["starts fine but trails off..."] * 5)
    assert _flags(spark, trailing)["ok_ellipsis_lines"] is False
    assert _flags(spark, "one...\nplain\nplain\nplain")[
        "ok_ellipsis_lines"] is True


def test_gopher_symbol_ratio_rule(spark):
    hashy = "# " * 30 + "word"
    assert _flags(spark, hashy)["ok_symbol_ratio"] is False
    assert _flags(spark, "the plain words here")["ok_symbol_ratio"] is True


def test_gopher_mean_word_length_rule(spark):
    assert _flags(spark, "a b c d e f g")["ok_mean_word_len"] is False
    longword = " ".join(["antidisestablishmentarian"] * 5)
    assert _flags(spark, longword)["ok_mean_word_len"] is False
    assert _flags(spark, "these words look normal")[
        "ok_mean_word_len"] is True


def test_gopher_alpha_and_stopword_rules(spark):
    digits = " ".join(["123"] * 10)
    assert _flags(spark, digits)["ok_alpha_words"] is False
    assert _flags(spark, digits)["ok_stopwords"] is False
    good = "the cat sat with 1 hat of be and that have to"
    f = _flags(spark, good)
    assert f["ok_alpha_words"] is True
    assert f["ok_stopwords"] is True


def test_gopher_word_count_and_keep_conjunction(spark):
    n50 = " ".join(["the"] + ["word"] * 49)          # exactly 50 words
    f = _flags(spark, n50, min_stopwords=1)
    assert f["ok_word_count"] is True
    assert f["keep"] is True
    f49 = _flags(spark, " ".join(["word"] * 49), min_stopwords=1)
    assert f49["ok_word_count"] is False
    assert f49["keep"] is False


def test_gopher_empty_text_no_division_error(spark):
    f = _flags(spark, "")
    assert f["ok_word_count"] is False
    assert f["keep"] is False


def test_classifier_score_bounds_and_monotone_stopwords(spark):
    import pyspark.sql.functions as F

    from msg_vector_search_spark.functions import analysis

    rows = [(0, "the a and is to of in it"),   # pure stopwords
            (1, "xylophone quartz vortex"),    # none
            (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", analysis.classifier_score(F.col("text")).alias("s")
    ).collect()}
    assert all(0.0 < v < 1.0 for v in out.values())
    # the stopword feature carries positive weight: all-stopword text
    # must outscore no-stopword text of comparable length
    assert out[0] > out[1]


def test_extract_text_malformed_object_raw_passthrough(spark):
    """r14 review: '{'-prefixed but MALFORMED json passes through raw
    (reference: json.loads raises -> raw), matching the '['-branch's
    existing behavior, instead of collapsing to '' and being dropped
    by the ingest empty-text filter."""
    assert one(spark, textops.extract_text(F.col("c")),
               c="{not valid json") == "{not valid json"
    assert one(spark, textops.extract_text(F.col("c")),
               c='{"text": "trunc') == '{"text": "trunc'
    # valid-but-no-text object is ALSO raw passthrough (reference falls
    # through to `return content`; r15 review fixed the '' collapse)
    assert one(spark, textops.extract_text(F.col("c")), c="{}") == "{}"
