"""Resumable pipeline runner: stage materialization, audit, resume."""

import os

from bigdatagenomic_spark.pipelines import run_curation_pipeline

SF_DIR = "/root/testdata/sf0.001"


def test_curation_pipeline_runs_and_resumes(spark, tmp_path):
    wd = str(tmp_path / "wd")
    final, audit = run_curation_pipeline(spark, SF_DIR, wd)
    assert [a["stage"] for a in audit] == [
        "quality_dedup_sample", "pii_scrub", "shard_assign"
    ]
    assert all(not a["resumed"] for a in audit)
    rows = final.count()
    assert rows > 0
    assert {"doc_id", "text", "shard", "pos"} <= set(final.columns)
    want = {(r.doc_id, r.shard, r.pos) for r in final.collect()}
    # monotone narrowing: later stages never invent rows
    assert audit[0]["rows"] >= audit[1]["rows"] == audit[2]["rows"]

    # second run resumes every stage from its _SUCCESS-marked parquet
    final2, audit2 = run_curation_pipeline(spark, SF_DIR, wd)
    assert all(a["resumed"] for a in audit2)
    assert final2.count() == rows

    # knock out the LAST stage only -> stages 1-2 resume, stage 3 reruns
    import shutil

    last = [d for d in sorted(os.listdir(wd)) if d.endswith("shard_assign")][0]
    shutil.rmtree(os.path.join(wd, last))
    final3, audit3 = run_curation_pipeline(spark, SF_DIR, wd)
    assert [a["resumed"] for a in audit3] == [True, True, False]
    got = {(r.doc_id, r.shard, r.pos) for r in final3.collect()}
    assert got == want  # deterministic stages -> identical rerun


def test_curation_pipeline_resumes_after_mid_stage_crash(spark, tmp_path):
    """Crash simulation (VERDICT r6 #6): the run dies DURING stage 2 —
    stage 1 is complete, stage 2's directory exists but has no _SUCCESS
    (partial parquet), stage 3 never started. The re-run must trust
    stage 1, recompute stage 2 over the partial dir, run stage 3, and
    produce exactly the rows of an uninterrupted run."""
    import shutil

    wd_ref = str(tmp_path / "ref")
    ref_final, _ = run_curation_pipeline(spark, SF_DIR, wd_ref)
    want = {tuple(r) for r in ref_final.collect()}

    wd = str(tmp_path / "crash")
    run_curation_pipeline(spark, SF_DIR, wd)
    dirs = sorted(os.listdir(wd))
    assert len(dirs) == 3
    # simulate the crash: stage 2 partial (drop its _SUCCESS, leave the
    # part files), stage 3 never written
    os.remove(os.path.join(wd, dirs[1], "_SUCCESS"))
    shutil.rmtree(os.path.join(wd, dirs[2]))
    assert os.listdir(os.path.join(wd, dirs[1]))  # partial files remain

    final, audit = run_curation_pipeline(spark, SF_DIR, wd)
    assert [a["resumed"] for a in audit] == [True, False, False]
    got = {tuple(r) for r in final.collect()}
    assert got == want  # byte-identical resume, per the runner contract
