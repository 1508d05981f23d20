"""Corpus file-format readers (SURVEY §2.1 S1/S2/S4-S7) — golden
values hand-derived from the reference reader semantics
(goldReader/carbReader/tabReader/seqReader/raw2col)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def tdir(tmp_path_factory):
    return tmp_path_factory.mktemp("conll")


def _write(tdir, name, content):
    p = tdir / name
    p.write_text(content)
    return str(p)


def test_column_file(spark, tdir):
    from openie_spark.sources.conll import read_column_file

    p = _write(tdir, "01col", (
        "The\tO\tA0-B\tA1-B\n"
        "runs\tP-B\tP-B\tO\n"
        "fast\tO\tA1-B\tO\n"
        "\n"
        "Hi\tO\n"
        "there\tP-B\n"
    ))
    rows = {r.block_idx: r for r in read_column_file(spark, p).collect()}
    assert rows[0].words == ["The", "runs", "fast"]
    assert rows[0].pre_tags == ["O", "P-B", "O"]
    assert rows[0].ext_tags == [["A0-B", "P-B", "A1-B"], ["A1-B", "O", "O"]]
    assert rows[1].words == ["Hi", "there"]
    assert rows[1].ext_tags == []


def test_column_file_np(spark, tdir):
    from openie_spark.sources.conll import read_column_file

    p = _write(tdir, "02np", (
        "The\tO\tA0-B\tNP\n"
        "runs\tP-B\tP-B\tO\n"
    ))
    r = read_column_file(spark, p, np_col=True).collect()[0]
    assert r.np_tags == ["NP", "O"]
    assert r.ext_tags == [["A0-B", "P-B"]]
    assert r.pre_tags == ["O", "P-B"]


def test_tuple_gold(spark, tdir):
    from openie_spark.sources.conll import read_tuple_file

    p = _write(tdir, "gold", (
        "A sentence here\tsaid\targ one \t arg two\n"
        "short\tline\n"                                  # <=2 fields: skipped
        "S2\tpred\t\tkept\tC: coref dropped\n"           # empty field removed
    ))
    rows = sorted(read_tuple_file(spark, p, "gold").collect(), key=lambda r: r.idx)
    assert len(rows) == 2
    assert rows[0].sent == "A sentence here" and rows[0].pred == "said"
    assert rows[0].args == ["arg one", "arg two"]        # stripped
    assert rows[0].confidence == 1.0
    assert rows[1].sent == "S2" and rows[1].args == ["kept"]


def test_tuple_carb_keeps_argless(spark, tdir):
    from openie_spark.sources.conll import read_tuple_file

    p = _write(tdir, "carb", "S1\tpred only\nS2\tp\ta1\tC: x\ta2\n")
    rows = sorted(read_tuple_file(spark, p, "carb").collect(), key=lambda r: r.idx)
    assert rows[0].args == [] and rows[0].pred == "pred only"
    assert rows[1].args == ["a1", "a2"]


def test_tuple_tab(spark, tdir):
    from openie_spark.sources.conll import read_tuple_file

    p = _write(tdir, "tab", "S one\t0.75\tloves\tJohn\tMary\n\nS two\t0.5\truns\n")
    rows = sorted(read_tuple_file(spark, p, "tab").collect(), key=lambda r: r.idx)
    assert rows[0].confidence == 0.75 and rows[0].args == ["John", "Mary"]
    assert rows[1].pred == "runs" and rows[1].args == []


def test_tuple_benchmark_gold(spark, tdir):
    """S8 benchmarkGoldReader: sent \t pred \t args..., stripped, no
    C-filter, confidence=1 (the reader's docstring claims a prob
    column; its code reads none — benchmarkGoldReader.py:28-42)."""
    from openie_spark.sources.conll import read_tuple_file

    p = _write(tdir, "bmk", (
        "S one\tloves\t John \tMary\n"
        "\n"
        "S two\truns\tC: kept here\n"))
    rows = sorted(read_tuple_file(spark, p, "benchmark").collect(), key=lambda r: r.idx)
    assert len(rows) == 2
    assert rows[0].pred == "loves" and rows[0].args == ["John", "Mary"]
    assert rows[0].confidence == 1.0
    assert rows[1].args == ["C: kept here"]      # no C-filter in this reader


def test_np_annotate_roundtrip(spark, tdir):
    """S3: NP annotation (deterministic heuristic chunker — spaCy
    absent in this container) round-trips through the 02-np dev line
    shape into read_column_file(np_col=True)."""
    from openie_spark.sources.conll import read_column_file
    from openie_spark.sources.npchunk import annotate_np, heuristic_chunks, np_lines

    words = ["the", "big", "cat", "is", "on", "the", "mat", "."]
    assert heuristic_chunks(words) == [(0, 3), (5, 7)]

    blocks = spark.createDataFrame(
        [("f", 0, words), ("f", 1, ["it", "is", "."])],
        "file string, block_idx int, words array<string>")
    ann = sorted(annotate_np(blocks).collect(), key=lambda r: r.block_idx)
    assert ann[0].np_tags == ["NP", "NP", "NP", "O", "O", "NP", "NP", "O"]
    assert ann[1].np_tags == ["NP", "O", "O"]

    txt = "\n\n".join(
        r.block_text for r in sorted(np_lines(annotate_np(blocks)).collect(),
                                     key=lambda r: r.block_idx)) + "\n"
    p = _write(tdir, "npdev", txt)
    back = sorted(read_column_file(spark, p, np_col=True).collect(),
                  key=lambda r: r.block_idx)
    assert back[0].words == words and back[0].np_tags == ann[0].np_tags
    assert back[1].np_tags == ann[1].np_tags


def test_oie16_reader(spark, tdir):
    """S8 oie16: header-driven field lookup, label[:2].strip('-') span
    grouping in first-appearance order, P span = predicate."""
    from openie_spark.sources.conll import read_oie16_file

    p = _write(tdir, "oie16", (
        "word_id\tword\tlabel\n"
        "0\tthe\tA0-B\n"
        "1\tcat\tA0-I\n"
        "2\tsat\tP-B\n"
        "3\ton\tO\n"
        "4\tmat\tA1-B\n"
        "\n"
        "0\tx\tA1-B\n"
        "1\truns\tP-B\n"))
    rows = sorted(read_oie16_file(spark, p).collect(), key=lambda r: r.block_idx)
    assert len(rows) == 2
    assert rows[0].sent == "the cat sat on mat"
    assert rows[0].pred == "sat"
    assert rows[0].args == ["the cat", "mat"]     # A0 before A1 (appearance order)
    assert rows[0].confidence == 1.0
    assert rows[1].pred == "runs" and rows[1].args == ["x"]


def test_unire_reader(spark, tdir):
    """S8 unire: JSONL with exact-duplicate lines dropped."""
    import json

    from openie_spark.sources.conll import read_unire_file

    line = json.dumps({"Sentence": "A loves B", "Predicate": {"text": "loves"},
                       "Arguments": [{"text": "A"}, {"text": "B"}]})
    other = json.dumps({"Sentence": "C runs", "Predicate": {"text": "runs"},
                        "Arguments": [{"text": "C"}]})
    p = _write(tdir, "unire", line + "\n" + line + "\n" + other + "\n")
    rows = sorted(read_unire_file(spark, p).collect(), key=lambda r: r.sent)
    assert len(rows) == 2                          # duplicate line dropped
    assert rows[0].sent == "A loves B" and rows[0].pred == "loves"
    assert rows[0].args == ["A", "B"] and rows[0].confidence == 1.0
    assert rows[1].args == ["C"]


def test_seq_file(spark, tdir):
    from openie_spark.sources.conll import read_seq_file

    p = _write(tdir, "seq", (
        "the\tA0-B\ncat\tA0-I\nsat\tP-B\non\tO\nmat\tA1-B\n"
        "\n"
        "x\tA1-I\ny\tP-B\n"
        "\n"
        "a\tO\nb\tP-I\n"
    ))
    rows = {r.block_idx: r for r in read_seq_file(spark, p).collect()}
    r0 = rows[0]
    assert r0.sent == "the cat sat on mat"
    assert (r0.pred.text, r0.pred.indices) == ("sat", [2])
    assert [(a.text, a.indices) for a in r0.args] == [("the cat", [0, 1]), ("mat", [4])]
    r1 = rows[1]  # leading A-I still accumulates (seqReader.py:58-62)
    assert [(a.text, a.indices) for a in r1.args] == [("x", [0])]
    assert (r1.pred.text, r1.pred.indices) == ("y", [1])
    r2 = rows[2]  # no A tags -> single empty arg; P-I without B still pred
    assert [(a.text, a.indices) for a in r2.args] == [("", [])]
    assert (r2.pred.text, r2.pred.indices) == ("b", [1])


def test_raw2col(spark, tdir):
    from openie_spark.sources.conll import raw2col, read_oie_conll_blocks

    # .oie.conll shape: idx \t word \t ... \t tag
    p = _write(tdir, "raw.oie.conll", (
        "0\tjohn\tA0-B\n1\tloves\tP-B\n2\tmary\tA1-B\n"
        "\n"
        "0\tjohn\tA4-B\n1\tloves\tP-I\n2\tmary\tA1-B\n"   # same sentence: merges
        "\n"
        "0\tother\tA0-B\n1\tsentence\tP-B\n"
    ))
    blocks = read_oie_conll_blocks(spark, p)
    out = {r.text: r for r in raw2col(blocks).collect()}
    assert len(out) == 2
    r = out["john loves mary"]
    # union pre_tags: later extraction's P-I overwrites P-B (raw2col.py:39-44)
    assert r.pre_tags == ["O", "P-I", "O"]
    # per-extraction columns: own P overwrites A; A4 -> O (raw2col.py:31-35,60-63)
    assert r.ext_tags == [["A0-B", "P-B", "A1-B"], ["O", "P-I", "A1-B"]]
    assert out["other sentence"].ext_tags == [["A0-B", "P-B"]]


def test_tuple_lines_roundtrip(spark, tdir):
    from openie_spark.operators.extract import extract_triples
    from openie_spark.sources.conll import read_tuple_file, tuple_lines
    from openie_spark.sources.transcripts import read_transcripts

    triples = extract_triples(read_transcripts(spark, "/root/testdata/sf0.001")).limit(50)
    out = str(tdir / "tuples_out")
    tuple_lines(triples).coalesce(1).write.mode("overwrite").text(out)
    back = read_tuple_file(spark, out, "gold")
    want = triples.filter("size(args) >= 1").count()  # gold keeps >2-field lines
    assert back.count() == want