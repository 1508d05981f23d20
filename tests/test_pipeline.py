"""Pipeline checkpoint/lineage/resume tests (M6, north_rule:
'checkpoint-resumable with per-partition lineage + metrics')."""

from __future__ import annotations

import json
import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    from openie_spark.pipeline import KGPipeline

    out = str(tmp_path_factory.mktemp("kg"))
    pipe = KGPipeline(spark, SF, out)
    summary = pipe.run(resume=True)
    return out, summary


def test_pipeline_summary_counts(pipeline_out):
    out, summary = pipeline_out
    assert summary["triples"] > 0
    assert summary["nodes"] > 0
    assert summary["edges"] > 0
    assert summary["triples_per_sec"] > 0
    assert set(summary["stages"]) == {
        "triples", "triples_norm", "vocab", "pairs", "components", "nodes", "edges",
        "relations"}


def test_manifests_lineage(pipeline_out):
    out, summary = pipeline_out
    for stage in ("triples", "vocab", "components", "nodes", "edges", "relations"):
        with open(os.path.join(out, stage, "_manifest.json")) as f:
            man = json.load(f)
        assert man["status"] == "complete"
        assert man["rows"] == summary["stages"][stage]["rows"]
        # per-partition lineage: bucket counts sum to total rows
        assert sum(man["per_bucket_rows"].values()) == man["rows"]
        assert man["fingerprint"]["model_version"] == "rule-v1"
    with open(os.path.join(out, "triples", "_manifest.json")) as f:
        tman = json.load(f)
    lo, hi = tman["conv_id_range"]
    assert lo.startswith("conv-") and hi >= lo
    with open(os.path.join(out, "vocab", "_manifest.json")) as f:
        vman = json.load(f)
    assert "skew" in vman["metrics"]


def test_full_resume_skips_everything(spark, pipeline_out):
    from openie_spark.pipeline import KGPipeline

    out, summary = pipeline_out
    pipe = KGPipeline(spark, SF, out)
    s2 = pipe.run(resume=True)
    assert all(st["resumed"] for st in s2["stages"].values())
    assert s2["triples"] == summary["triples"]
    assert s2["edges"] == summary["edges"]


def test_partial_resume_rebuilds_dirty_suffix(spark, pipeline_out):
    """Simulate a kill between stages: drop the nodes/edges manifests;
    resume must skip the completed prefix and rebuild only the suffix,
    reproducing identical outputs (idempotent overwrite)."""
    from openie_spark.pipeline import KGPipeline

    out, summary = pipeline_out
    os.remove(os.path.join(out, "nodes", "_manifest.json"))
    os.remove(os.path.join(out, "edges", "_manifest.json"))
    pipe = KGPipeline(spark, SF, out)
    s2 = pipe.run(resume=True)
    st = s2["stages"]
    assert st["triples"]["resumed"] and st["components"]["resumed"]
    assert not st["nodes"]["resumed"] and not st["edges"]["resumed"]
    assert st["nodes"]["rows"] == summary["stages"]["nodes"]["rows"]
    assert st["edges"]["rows"] == summary["stages"]["edges"]["rows"]


def test_no_resume_rebuilds_all(spark, pipeline_out):
    from openie_spark.pipeline import KGPipeline

    out, summary = pipeline_out
    pipe = KGPipeline(spark, SF, out)
    s2 = pipe.run(resume=False)
    assert not any(st["resumed"] for st in s2["stages"].values())
    assert s2["edges"] == summary["edges"]

def test_table_io_seam_defaults_to_parquet(spark, tmp_path):
    """SURVEY §7 TableIO seam: catalog-absent behavior is the round-2
    Parquet+manifest layout, byte-for-byte path-compatible; with a
    configured catalog the pipeline would route through Iceberg
    writeTo() (jar absent in sandbox — routing pinned only)."""
    from openie_spark.pipeline import (
        IcebergTableIO,
        KGPipeline,
        ParquetTableIO,
        make_table_io,
    )

    io = make_table_io(spark, str(tmp_path))
    assert isinstance(io, ParquetTableIO)
    assert io.location("triples") == str(tmp_path / "triples")
    pipe = KGPipeline(spark, "in", str(tmp_path))
    assert isinstance(pipe.io, ParquetTableIO)
    assert pipe._manifest_path("vocab") == str(tmp_path / "vocab" / "_manifest.json")

    spark.conf.set("spark.openie.catalog", "lake")
    try:
        io2 = make_table_io(spark, str(tmp_path))
        assert isinstance(io2, IcebergTableIO)
        assert io2.qualified("triples") == "lake.openie.triples"
        # manifests stay FS sidecars under output_dir either way
        pipe2 = KGPipeline(spark, "in", str(tmp_path))
        assert pipe2._manifest_path("triples") == str(
            tmp_path / "triples" / "_manifest.json")

        # Drive the Iceberg branch as far as the sandbox allows: the
        # write must route into DataFrameWriterV2 against the
        # configured catalog and die on CATALOG resolution (no Iceberg
        # runtime jar / no spark.sql.catalog.lake impl here), NOT on
        # anything in our own plumbing. The error naming the catalog
        # proves the qualified identifier reached Spark's v2 resolver.
        df = spark.range(3).withColumnRenamed("id", "x")
        try:
            io2.write(spark, df, "triples")
            raise AssertionError(
                "iceberg write unexpectedly succeeded without a catalog")
        except Exception as ex:  # AnalysisException / ParseException
            msg = str(ex).lower()
            assert "lake" in msg or "catalog" in msg, msg
    finally:
        spark.conf.unset("spark.openie.catalog")


def test_pipeline_analytics_stages_and_resume(spark, tmp_path_factory):
    """--analytics materializes pagerank/triangles/khop as resumable
    stages: manifests written, rows stable across a resumed re-run."""
    from openie_spark.pipeline import KGPipeline

    out = str(tmp_path_factory.mktemp("kga"))
    s1 = KGPipeline(spark, SF, out, analytics=True).run(resume=True)
    for st in ("pagerank", "triangles", "khop", "communities"):
        assert st in s1["stages"] and s1["stages"][st]["rows"] > 0
        man = json.load(open(os.path.join(out, st, "_manifest.json")))
        assert man["rows"] == s1["stages"][st]["rows"]
    # pagerank/triangles cover every node; khop only the <=K-hop ball
    assert s1["stages"]["pagerank"]["rows"] == s1["nodes"]
    assert s1["stages"]["triangles"]["rows"] == s1["nodes"]
    assert 0 < s1["stages"]["khop"]["rows"] <= s1["nodes"]
    assert s1["stages"]["communities"]["rows"] == s1["nodes"]
    # harmonic: one row per seed that reached anything; seed_distances:
    # ordered seed pairs within K hops (both read the shared BFS ball,
    # so they can't exceed the ball's coverage)
    assert 0 <= s1["stages"]["harmonic"]["rows"] <= s1["stages"]["khop"]["rows"]
    assert s1["stages"]["seed_distances"]["rows"] >= 0
    # kcore may legitimately be empty on a sparse test graph (rows>=0);
    # degree_hist always has >=1 bin when nodes exist
    assert s1["stages"]["kcore"]["rows"] >= 0
    assert 0 < s1["stages"]["degree_hist"]["rows"] <= 65
    # salsa scores every node; cardinality one row per relation; the
    # truss backbone may be empty on a sparse test slice (rows >= 0)
    assert s1["stages"]["salsa"]["rows"] == s1["nodes"]
    assert 0 < s1["stages"]["rel_cardinality"]["rows"]
    assert s1["stages"]["truss"]["rows"] >= 0
    # rules/conflicts may be empty on a sparse slice; the type graph
    # always has >= 1 type pair when edges exist
    assert s1["stages"]["rules"]["rows"] >= 0
    assert s1["stages"]["conflicts"]["rows"] >= 0
    assert 0 < s1["stages"]["type_graph"]["rows"] <= 81
    s2 = KGPipeline(spark, SF, out, analytics=True).run(resume=True)
    assert all(s2["stages"][st]["resumed"]
               for st in ("pagerank", "triangles", "khop", "harmonic",
                          "seed_distances", "communities",
                          "kcore", "degree_hist", "salsa",
                          "rel_cardinality", "truss", "rules",
                          "conflicts", "type_graph"))
    assert {st: s2["stages"][st]["rows"] for st in s2["stages"]} == \
           {st: s1["stages"][st]["rows"] for st in s1["stages"]}


def test_pipeline_export_stages_and_resume(spark, tmp_path_factory):
    """--export materializes the temporal-interval and N-Triples sinks
    as resumable stages; line counts are consistent with nodes +
    distinct relations, intervals are well-formed."""
    from openie_spark.pipeline import KGPipeline

    out = str(tmp_path_factory.mktemp("kge"))
    s1 = KGPipeline(spark, SF, out, export=True).run(resume=True)
    for st in ("temporal", "export_nt"):
        assert st in s1["stages"] and s1["stages"][st]["rows"] > 0
        man = json.load(open(os.path.join(out, st, "_manifest.json")))
        assert man["rows"] == s1["stages"][st]["rows"]
    nt = spark.read.parquet(os.path.join(out, "export_nt"))
    rel_lines = nt.where(~nt.nt.contains("<urn:kg:label>")).count()
    assert nt.count() == s1["nodes"] + rel_lines
    tmp = spark.read.parquet(os.path.join(out, "temporal"))
    assert tmp.where("first_us > last_us").count() == 0
    assert s1["stages"]["temporal"]["rows"] == s1["relations"]
    # the growth curve is day-bounded and cumulative totals end at the
    # graph's distinct entity count
    g = spark.read.parquet(os.path.join(out, "growth"))
    assert 0 < g.count() <= 366
    # growth counts entities with >= 1 edge — a subset of the node
    # table (mention-only entities never reach an edge endpoint)
    assert 0 < g.orderBy(g.day.desc()).first().cum_entities <= s1["nodes"]
    s2 = KGPipeline(spark, SF, out, export=True).run(resume=True)
    assert all(s2["stages"][st]["resumed"]
               for st in ("temporal", "export_nt", "growth"))


def test_pipeline_enrich_stages_and_resume(spark, tmp_path_factory):
    """--enrich materializes typing / schema / salience / coref-edge /
    segment tables as resumable stages with manifests; cross-table
    invariants hold; a resumed re-run skips all five."""
    from openie_spark.pipeline import KGPipeline

    stages = ("entity_types", "schema", "salience", "coref_edges",
              "segments", "timeline", "edge_split", "yield")
    out = str(tmp_path_factory.mktemp("kgn"))
    s1 = KGPipeline(spark, SF, out, enrich=True).run(resume=True)
    for st in stages:
        assert st in s1["stages"]
        man = json.load(open(os.path.join(out, st, "_manifest.json")))
        assert man["rows"] == s1["stages"][st]["rows"]
    # typing covers every node; segments cover every turn
    assert s1["stages"]["entity_types"]["rows"] == s1["nodes"]
    seg = spark.read.parquet(os.path.join(out, "segments"))
    turns = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert seg.count() == turns
    assert seg.where("seg_idx < 0").count() == 0
    # every coref-recovered edge endpoint exists in the nodes table
    ce = spark.read.parquet(os.path.join(out, "coref_edges"))
    nodes = spark.read.parquet(os.path.join(out, "nodes"))
    ids = {r.entity_id for r in nodes.select("entity_id").collect()}
    for r in ce.select("src_id", "dst_id").collect():
        assert r.src_id in ids and r.dst_id in ids
    # split partitions the distinct statements; yield covers every conv
    sp = spark.read.parquet(os.path.join(out, "edge_split"))
    assert sp.count() == sp.select("src_id", "pred", "dst_id").distinct().count()
    y = spark.read.parquet(os.path.join(out, "yield"))
    assert y.where("n_triples > 0").count() > 0
    s2 = KGPipeline(spark, SF, out, enrich=True).run(resume=True)
    assert all(s2["stages"][st]["resumed"] for st in stages)


@pytest.mark.skipif(
    not os.path.exists("/opt/spark/bin/spark-submit"),
    reason="spark-submit launcher not installed")
def test_spark_submit_py_files_launch(tmp_path):
    """The north rule's literal launch mode: `spark-submit --py-files
    <pkg.zip> kg_job.py` from an ISOLATED cwd containing only the
    entrypoint script — every openie_spark import (driver and executor
    python workers alike) must come from the shipped zip, not from a
    repo checkout on sys.path. Runs the full sf0.001 pipeline and
    checks the summary JSON + a manifest landed."""
    import json as _json
    import shutil
    import subprocess
    import sys
    import zipfile

    import openie_spark

    root = os.path.dirname(os.path.dirname(os.path.abspath(openie_spark.__file__)))
    iso = tmp_path / "iso"
    iso.mkdir()
    shutil.copy(os.path.join(root, "tools", "kg_job.py"), iso / "kg_job.py")
    zp = iso / "openie_spark.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for dirpath, _, files in os.walk(os.path.join(root, "openie_spark")):
            for f in files:
                if f.endswith((".py", ".txt")):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    out_dir = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[4]",
         "--py-files", "openie_spark.zip", "kg_job.py",
         "--input", SF, "--output", out_dir,
         "--no-resume", "--shuffle-partitions", "4"],
        cwd=str(iso), env=env, capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    summary = _json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["triples"] > 0 and summary["nodes"] > 0
    assert summary["edges"] > 0
    man = _json.load(open(os.path.join(out_dir, "triples", "_manifest.json")))
    assert man["rows"] == summary["triples"]


def test_manifest_storage_stats(pipeline_out):
    """Every stage manifest carries physical-layout lineage: data file
    count and total bytes of the written table (sidecars excluded)."""
    out, summary = pipeline_out
    for stage in ("triples", "vocab", "nodes", "edges"):
        man = json.load(open(os.path.join(out, stage, "_manifest.json")))
        assert man["data_files"] >= 1
        assert man["data_bytes"] > 0
        # listing excluded the manifest itself and _SUCCESS
        sz = sum(os.path.getsize(os.path.join(out, stage, f))
                 for f in os.listdir(os.path.join(out, stage))
                 if not f.startswith(("_", ".")))
        assert man["data_bytes"] == sz
