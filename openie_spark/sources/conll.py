"""CoNLL-style corpus file readers — the reference's source formats
re-expressed as DataFrame readers (SURVEY.md §2.1 S1/S2/S4-S7).

Files are read with ``spark.read.text(wholetext=True)`` (one row per
file → block order is deterministic), then all parsing is column
expressions: blocks split on blank lines, lines on tabs, tag→span
reassembly as array folds. Corpora ship as many small files, so
per-file parallelism is the natural distribution axis; within-file
parsing is narrow.

Reference parity (file:line):
  * read_column_file  ≙ utils/dataset.py:28-53 (S1; 01-col / 02-np)
  * read_tuple_file   ≙ eval/oie_eval/oie_readers/goldReader.py:14-39
    ('gold'), carbReader.py:14-40 ('carb'), tabReader.py:20-46 ('tab'),
    benchmarkGoldReader.py:19-45 ('benchmark')
  * read_seq_file     ≙ eval/oie_eval/oie_readers/seqReader.py:24-89
  * read_oie16_file   ≙ eval/oie_eval/oie_readers/oie16Reader.py:14-54
  * read_unire_file   ≙ eval/oie_eval/oie_readers/unireReader.py:22-43
  * raw2col           ≙ data/corups/oie2016/00-raw/raw2col.py:16-77
  * write_tuple_lines ≙ run.py:148-178 tuple TSV shape (K1 sink)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SPAN = "struct<text:string,indices:array<int>>"


def _blocks(spark: SparkSession, path: str) -> DataFrame:
    """file → one row per blank-line-separated block, with stable
    (file, block_idx) order and the block's lines as an array."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value")
    # Spark trim() strips spaces only, not newlines: drop empty lines
    # and empty blocks explicitly (reference: fr.read().strip()).
    return raw.select(
        "file",
        F.posexplode(F.split(F.col("value"), "\n\n+")).alias("block_idx", "block"),
    ).select(
        "file", "block_idx",
        F.filter(F.split("block", "\n"), lambda l: l != "").alias("lines"),
    ).filter(F.size("lines") > 0)


def read_column_file(spark: SparkSession, path: str, np_col: bool = False) -> DataFrame:
    """S1: 01-col format — col0 word, col1 predicate-union tags, cols
    2..N one per gold extraction (full BIO). ``np_col=True`` peels the
    trailing spaCy NP column (02-np format, col2np.py:1-40)."""
    df = _blocks(spark, path).select(
        "file", "block_idx",
        F.transform("lines", lambda l: F.split(l, "\t")).alias("fields"),
    )
    ncols = F.array_min(F.transform("fields", F.size))
    hi0 = ncols - 1 - (1 if np_col else 0)   # 0-based index of last ext column
    ext_cols = F.when(
        hi0 >= 2,
        F.transform(
            F.sequence(F.lit(2), F.greatest(hi0, F.lit(2))),
            lambda c: F.transform(F.col("fields"), lambda f: F.element_at(f, c + 1)),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    cols = [
        F.col("file"), F.col("block_idx"),
        F.transform("fields", lambda f: f[0]).alias("words"),
        F.transform("fields", lambda f: f[1]).alias("pre_tags"),
        ext_cols.alias("ext_tags"),
    ]
    if np_col:
        cols.append(F.transform("fields", lambda f: F.element_at(f, -1)).alias("np_tags"))
    return df.select(*cols)


def read_tuple_file(spark: SparkSession, path: str, style: str = "gold") -> DataFrame:
    """S4/S5/S7/S8: tuple TSV → (sent, pred, args, confidence, idx).

    style='gold'     : drop empty fields, skip lines with <=2 fields,
                       drop args containing 'C: ', strip fields,
                       confidence=1 (goldReader.py).
    style='carb'     : same minus the empty-field drop and short-line
                       skip.
    style='tab'      : sent \t confidence \t pred \t args...
                       (tabReader.py — no C-filter).
    style='benchmark': sent \t pred \t args..., blank lines skipped,
                       fields stripped, confidence=1, NO C-filter
                       (benchmarkGoldReader.py:28-42 — its docstring
                       claims a prob column; the code reads none).
    """
    if style not in ("gold", "carb", "tab", "benchmark"):
        raise ValueError(style)
    raw = spark.read.text(path, wholetext=True).select(
        F.posexplode(F.split(F.trim(F.col("value")), "\n")).alias("idx", "line"))
    fields = F.split(F.trim(F.col("line")), "\t")
    if style == "gold":
        fields = F.filter(fields, lambda x: x != "")
    df = raw.select(F.col("idx").cast("long").alias("idx"), fields.alias("f"))
    if style == "gold":
        df = df.filter(F.size("f") > 2)
    elif style in ("tab", "benchmark"):
        df = df.filter(F.trim(F.col("line")) != "")
    else:
        df = df.filter(F.size("f") >= 2)
    if style == "tab":
        sent, conf, pred = F.col("f")[0], F.col("f")[1].cast("double"), F.col("f")[2]
        args = F.slice("f", 4, F.greatest(F.size("f") - 3, F.lit(0)))
    else:
        sent, conf, pred = F.trim(F.col("f")[0]), F.lit(1.0), F.trim(F.col("f")[1])
        args = F.slice("f", 3, F.greatest(F.size("f") - 2, F.lit(0)))
        if style != "benchmark":
            args = F.filter(args, lambda a: ~a.contains("C: "))
    return df.select(
        sent.alias("sent"), pred.alias("pred"),
        # explicit unary lambda: F.trim has an optional 2nd parameter in
        # Spark 4, so passing it bare would bind as an (elem, idx) lambda
        F.transform(args, lambda a: F.trim(a)).alias("args"),
        conf.alias("confidence"), "idx",
    )


def _seq_fold(pairs: Column) -> Column:
    """seqReader.py:24-89 as an array fold over (word, tag) structs.
    B/I semantics: P-* accumulates the predicate; A*-B flushes the open
    arg and starts a new one; A*-I appends (even with no open B)."""
    acc0 = F.struct(
        F.array().cast(f"array<{SPAN}>").alias("args"),
        F.lit("").alias("arg"), F.array().cast("array<int>").alias("aids"),
        F.lit("").alias("rel"), F.array().cast("array<int>").alias("rids"),
        F.lit(0).alias("i"),
    )

    def step(a, p):
        w, t = p["w"], p["t"]
        last = F.substring(t, -1, 1)
        head = F.substring(t, 1, 1)
        is_p = ((last == "B") | (last == "I")) & (head == "P")
        is_ab = (last == "B") & (head == "A")
        is_ai = (last == "I") & (head == "A")
        flushed_args = F.when(
            is_ab & (F.length(a["arg"]) > 0),
            F.concat(a["args"], F.array(F.struct(
                F.trim(a["arg"]).alias("text"), a["aids"].alias("indices")))),
        ).otherwise(a["args"])
        return F.struct(
            flushed_args.alias("args"),
            F.when(is_ab, F.concat(w, F.lit(" ")))
             .when(is_ai, F.concat(a["arg"], w, F.lit(" ")))
             .otherwise(a["arg"]).alias("arg"),
            F.when(is_ab, F.array(a["i"]))
             .when(is_ai, F.concat(a["aids"], F.array(a["i"])))
             .otherwise(a["aids"]).alias("aids"),
            F.when(is_p, F.concat(a["rel"], w, F.lit(" "))).otherwise(a["rel"]).alias("rel"),
            F.when(is_p, F.concat(a["rids"], F.array(a["i"]))).otherwise(a["rids"]).alias("rids"),
            (a["i"] + 1).alias("i"),
        )

    def fin(a):
        return F.struct(
            F.concat(a["args"], F.array(F.struct(
                F.trim(a["arg"]).alias("text"), a["aids"].alias("indices")))).alias("args"),
            F.struct(F.trim(a["rel"]).alias("text"), a["rids"].alias("indices")).alias("pred"),
        )

    return F.aggregate(pairs, acc0, step, fin)


def read_seq_file(spark: SparkSession, path: str) -> DataFrame:
    """S6: 2+-column BIO-tagged file → reassembled extractions with
    token indices: (sent, pred struct, args array<struct>, confidence)."""
    df = _blocks(spark, path).select(
        "file", "block_idx",
        F.transform(
            F.filter("lines", lambda l: F.length(l) > 0),
            lambda l: F.struct(
                F.split(l, "\t")[0].alias("w"),
                F.element_at(F.split(l, "\t"), -1).alias("t"),
            ),
        ).alias("pairs"),
    )
    folded = df.select(
        "file", "block_idx",
        F.array_join(F.transform("pairs", lambda p: p["w"]), " ").alias("sent"),
        _seq_fold(F.col("pairs")).alias("ext"),
    )
    return folded.select(
        "file", "block_idx", "sent",
        F.col("ext.pred").alias("pred"), F.col("ext.args").alias("args"),
        F.lit(1.0).alias("confidence"),
    )


def read_oie16_file(spark: SparkSession, path: str) -> DataFrame:
    """S8: oie16 gold format (oie16Reader.py:14-54) — a header line
    names the tab-separated fields (must include ``word`` and
    ``label``); blank-line-separated blocks of per-word rows. Each
    word's span label is ``label[:2].strip('-')`` ('A0-B' → 'A0',
    'P-B' → 'P', 'O' stays); words group into spans by label in
    first-appearance order; span 'P' is the predicate, the rest are
    args. One extraction per block, confidence 1.

    Deviation: a block with no P-labeled word yields pred='' (the
    reference raises KeyError on its own malformed data)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value")
    all_lines = F.split(F.col("value"), "\n")
    header_fields = F.split(F.element_at(all_lines, 1), "\t")
    body = F.array_join(
        F.slice(all_lines, 2, F.greatest(F.size(all_lines) - 1, F.lit(0))), "\n")
    with_ids = raw.select(
        "file",
        F.array_position(header_fields, "word").cast("int").alias("w_id"),
        F.array_position(header_fields, "label").cast("int").alias("l_id"),
        F.posexplode(F.split(body, "\n\n+")).alias("block_idx", "block"),
    ).select(
        "file", "block_idx", "w_id", "l_id",
        F.filter(F.split("block", "\n"), lambda l: F.trim(l) != "").alias("lines"),
    ).filter(F.size("lines") > 0)

    words = F.transform(
        "lines", lambda l: F.try_element_at(F.split(l, "\t"), F.col("w_id")))
    labs = F.transform(
        "lines",
        lambda l: F.btrim(
            F.substring(F.try_element_at(F.split(l, "\t"), F.col("l_id")), 1, 2),
            F.lit("-")))
    df = with_ids.select(
        "file", "block_idx", words.alias("words"), labs.alias("labs"))

    def span(label) -> Column:
        return F.array_join(
            F.zip_with("words", "labs", lambda w, lb: F.when(lb == label, w)), " ")

    lab_order = F.filter(F.array_distinct(F.col("labs")), lambda x: x != "O")
    return df.select(
        "file", "block_idx",
        F.array_join("words", " ").alias("sent"),
        span(F.lit("P")).alias("pred"),
        F.transform(
            F.filter(lab_order, lambda x: x != "P"), span).alias("args"),
        F.lit(1.0).alias("confidence"),
    )


def read_unire_file(spark: SparkSession, path: str) -> DataFrame:
    """S8: unire system output, JSON-lines (unireReader.py:22-43):
    {Sentence, Predicate: {text}, Arguments: [{text}, ...]} →
    (sent, pred, args, confidence=1). Exactly-repeated raw lines are
    dropped, keeping one (unireReader.py:36-41)."""
    lines = (
        spark.read.text(path)
        .filter(F.trim("value") != "")
        .dropDuplicates(["value"])
    )
    j = F.from_json(
        "value",
        "Sentence string, Predicate struct<text:string>, "
        "Arguments array<struct<text:string>>")
    return lines.select(j.alias("j")).select(
        F.col("j.Sentence").alias("sent"),
        F.col("j.Predicate.text").alias("pred"),
        F.transform("j.Arguments", lambda a: a["text"]).alias("args"),
        F.lit(1.0).alias("confidence"),
    )


def read_oie_conll_blocks(spark: SparkSession, path: str) -> DataFrame:
    """.oie.conll blocks: field 1 = word, last field = tag
    (raw2col.py:18,27) — the raw2col() input shape."""
    return _blocks(spark, path).select(
        "file", "block_idx",
        F.transform("lines", lambda l: F.split(l, "\t")[1]).alias("words"),
        F.transform("lines", lambda l: F.element_at(F.split(l, "\t"), -1)).alias("tags"),
    )


def raw2col(blocks: DataFrame) -> DataFrame:
    """S2: .oie.conll blocks → 01-col rows. Input: (block_idx, words
    array, tags array) — one row per ORIGINAL extraction block (field 1
    = word, last field = tag, raw2col.py:18,27).

    Semantics (raw2col.py:16-77): sentences dedup by joined text;
    col1 = union of P tags across the sentence's extractions (later
    blocks overwrite, :39-44); per-extraction column keeps A0-A3 tags
    (A4+ → 'O', :31-35) with that extraction's OWN P tags overwriting
    (:60-63)."""
    per_ext = blocks.select(
        "block_idx", "words",
        F.array_join("words", " ").alias("text"),
        F.transform(
            "tags",
            lambda t: F.when(F.substring(t, 1, 1) == "P",
                             F.when(F.substring(t, -1, 1) == "I", "P-I").otherwise("P-B"))
                       .otherwise(F.lit("O")),
        ).alias("pre_tag"),
        F.transform(
            "tags",
            lambda t: F.when(
                (F.substring(t, 1, 1) == "A") & F.substring(t, 2, 1).isin("0", "1", "2", "3"), t
            ).otherwise(F.lit("O")),
        ).alias("arg_tag"),
    ).withColumn(
        "ext_col",
        F.zip_with("arg_tag", "pre_tag", lambda a, p: F.when(p != "O", p).otherwise(a)),
    )
    merged = per_ext.groupBy("text").agg(
        F.min("block_idx").alias("block_idx"),
        F.first("words").alias("words"),
        F.array_sort(F.collect_list(F.struct("block_idx", "pre_tag", "ext_col"))).alias("exts"),
    )
    union_pre = F.aggregate(
        F.col("exts"),
        F.transform(F.col("words"), lambda _: F.lit("O")),
        lambda acc, e: F.zip_with(acc, e["pre_tag"], lambda a, b: F.when(b != "O", b).otherwise(a)),
    )
    return merged.select(
        "block_idx", "text", "words",
        union_pre.alias("pre_tags"),
        F.transform("exts", lambda e: e["ext_col"]).alias("ext_tags"),
    )


def tuple_lines(triples: DataFrame) -> DataFrame:
    """K1 sink shape: one TSV line per extraction,
    ``sent \\t pred \\t arg...`` (run.py:176-178); write with
    ``df.write.text`` for byte-parity with the reference's output."""
    return triples.select(
        F.concat_ws("\t", F.col("sent"), F.col("pred"), F.concat_ws("\t", F.col("args"))).alias("value")
    )
