"""Golden tests for the fidelity tokenizer (FIXTURES.md §4) and the
Porter2 stemmer."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.functions.fidelity import (
    tokenize_text,
    tokenize_udf,
)
from simple_mapreduce_search_engine_information_retrieval__spark.functions.stemmer import stem


def test_stemmer_goldens():
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "tie",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "hopping": "hop", "hoping": "hope",
        "falling": "fall", "filing": "file", "happy": "happi",
        "sky": "sky", "enjoy": "enjoy", "quickly": "quick",
        "national": "nation", "rational": "ration", "generate": "generat",
        "dying": "die", "skies": "sky", "ugly": "ugli",
        "running": "run", "runner": "runner", "relational": "relat",
        "conditional": "condit", "electricity": "electr",
        "hopeful": "hope", "goodness": "good", "meeting": "meet",
        "ionization": "ioniz",
    }
    fails = {w: (e, stem(w)) for w, e in cases.items() if stem(w) != e}
    assert not fails, fails


def test_acronyms():
    # reference TagTokenizer.java:479-527 semantics (FIXTURES.md §4)
    assert tokenize_text("I.B.M.", stopword=False, do_stem=False) == ["ibm"]
    assert tokenize_text("umass.edu", stopword=False, do_stem=False) == ["umass", "edu"]
    assert tokenize_text("ph.d.", stopword=False, do_stem=False) == ["ph"]
    assert tokenize_text("don't", stopword=False, do_stem=False) == ["dont"]


def test_tag_handling():
    assert tokenize_text("<script>x=1;</script>visible", stopword=False, do_stem=False) == ["visible"]
    assert tokenize_text("<style>p{}</style>shown", stopword=False, do_stem=False) == ["shown"]
    assert tokenize_text("a<!-- hidden -->b", stopword=False, do_stem=False) == ["a", "b"]
    assert tokenize_text("x&amp;y", stopword=False, do_stem=False) == ["x", "y"]
    assert tokenize_text("<b>bold</b> word", stopword=False, do_stem=False) == ["bold", "word"]


def test_limits_and_stopwords():
    long_tok = "x" * 150
    assert tokenize_text(f"ok {long_tok} fine", stopword=False, do_stem=False) == ["ok", "fine"]
    # stopwords removed BEFORE stemming (GalagoTokenizer.java:152-156)
    assert tokenize_text("the running dogs", do_stem=True) == ["run", "dog"]


def test_reference_demo_string():
    # the reference's own tokenizer smoke input (GalagoTokenizer.java:189)
    s = (" this is a the <test> for the teokenizer 101 546 "
         "345-543543545436-4656765865865 rgger <xml> ergtre 456435klj345lj34590")
    toks = tokenize_text(s, do_stem=False)
    # tags and stopwords (this is a the for) gone; '-' splits the numbers
    assert toks == ["teokenizer", "101", "546", "345", "543543545436",
                    "4656765865865", "rgger", "ergtre", "456435klj345lj34590"]


def test_udf_matches_local(spark):
    rows = [("a", "The I.B.M. <b>systems</b> are running quickly!"),
            ("b", "<script>no</script> umass.edu don't stop")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r.toks for r in df.select("doc_id", tokenize_udf(F.col("text")).alias("toks")).collect()}
    assert got["a"] == tokenize_text(rows[0][1])
    assert got["b"] == tokenize_text(rows[1][1])
