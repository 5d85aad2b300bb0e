"""End-to-end `spark-submit --py-files` evidence (BASELINE.json north
rule: "run via spark-submit --py-files on multi-executor clusters").

Packages the engine zip, then runs the build job and the top-k job as
REAL spark-submit child processes — the engine code reaches the workers
only through --py-files (the subprocess cwd puts `scripts/` on sys.path,
not the repo root)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(list(pyspark.__path__)[0], "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("no spark-submit binary available")


def _run(args: list[str], timeout: int = 300) -> str:
    env = os.environ.copy()
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        args, capture_output=True, text=True, cwd=ROOT,
        timeout=timeout, env=env,
    )
    assert r.returncode == 0, (
        f"spark-submit failed ({r.returncode}):\n{r.stderr[-3000:]}"
    )
    return r.stdout


def _load_package_module():
    """Load scripts/package.py without mutating sys.path/sys.modules —
    the generic module name 'package' must not leak into the pytest
    session (it could shadow later imports)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_tts_package_script", os.path.join(ROOT, "scripts", "package.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spark_submit_py_files_end_to_end(tmp_path):
    package = _load_package_module()

    zip_path = package.build(str(tmp_path / "tts.zip"))
    submit = _spark_submit()
    idx = str(tmp_path / "idx")

    out = _run([
        submit, "--master", "local[2]", "--py-files", zip_path,
        os.path.join(ROOT, "scripts", "build_index_job.py"),
        "--synth", "400", "--output", idx,
        "--segments", "2", "--buckets", "8",
    ])
    stats = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    )
    assert stats["indexed_rows"] == 400
    assert stats["segments"] == 2
    assert stats["files_per_sec"] > 0

    out = _run([
        submit, "--master", "local[2]", "--py-files", zip_path,
        os.path.join(ROOT, "scripts", "topk_job.py"),
        "--index", idx, "--query", "def return",
        "--query", "class import", "-k", "5",
    ])
    lines = [json.loads(ln) for ln in out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 2
    for rec in lines:
        scores = [s for _, s in rec["topk"]]
        assert len(scores) == 5
        assert scores == sorted(scores, reverse=True)

    # batch mode: same queries in ONE call, identical per-query results
    out = _run([
        submit, "--master", "local[2]", "--py-files", zip_path,
        os.path.join(ROOT, "scripts", "topk_job.py"),
        "--index", idx, "--query", "def return",
        "--query", "class import", "-k", "5", "--batch",
    ])
    rec = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    )
    assert rec["batch"] is True
    assert rec["topk"]["q00"] == lines[0]["topk"]
    assert rec["topk"]["q01"] == lines[1]["topk"]

    # filtered batch mode: the --lang predicate plumbs through to the
    # cogrouped F2 scorer; every surviving (doc, score) pair must come
    # from the unfiltered ranking's doc universe restricted to the lang
    # (exactness is pinned by the engine oracle tests — here we prove
    # the CLI wires the predicate end-to-end and the filter bites)
    out = _run([
        submit, "--master", "local[2]", "--py-files", zip_path,
        os.path.join(ROOT, "scripts", "topk_job.py"),
        "--index", idx, "--query", "def return",
        "--query", "class import", "-k", "5", "--batch", "--lang", "py",
    ])
    frec = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    )
    assert frec["langs"] == ["py"]
    for qid in ("q00", "q01"):
        scores = [s for _, s in frec["topk"][qid]]
        assert scores == sorted(scores, reverse=True)
        assert len(scores) <= 5
    # the synthetic corpus mixes langs, so restricting to py must change
    # at least one query's result set
    assert frec["topk"] != rec["topk"]


def test_spark_submit_query_modes(tmp_path):
    """The CLI's MultiTermQuery modes + boolean clauses run end-to-end
    through spark-submit (the exactness of each mode is pinned by the
    engine oracle tests; this proves the job wires them)."""
    package = _load_package_module()

    zip_path = package.build(str(tmp_path / "tts.zip"))
    submit = _spark_submit()
    idx = str(tmp_path / "idx")

    _run([
        submit, "--master", "local[2]", "--py-files", zip_path,
        os.path.join(ROOT, "scripts", "build_index_job.py"),
        "--synth", "400", "--output", idx,
        "--segments", "2", "--buckets", "8",
    ])

    # prefix mode: 're' expands over return/req... — scores descend
    out = _run([
        submit, "--master", "local[2]", "--py-files", zip_path,
        os.path.join(ROOT, "scripts", "topk_job.py"),
        "--index", idx, "--query", "re", "-k", "5", "--mode", "prefix",
    ])
    rec = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    )
    assert rec["mode"] == "prefix" and len(rec["topk"]) == 5
    scores = [s for _, s in rec["topk"]]
    assert scores == sorted(scores, reverse=True)

    # fuzzy mode: 'claas' within 2 edits of 'class'
    out = _run([
        submit, "--master", "local[2]", "--py-files", zip_path,
        os.path.join(ROOT, "scripts", "topk_job.py"),
        "--index", idx, "--query", "claas", "-k", "5", "--mode", "fuzzy",
    ])
    rec = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    )
    assert rec["mode"] == "fuzzy" and len(rec["topk"]) == 5

    # boolean clauses: must_not shrinks/changes the plain result
    plain = _run([
        submit, "--master", "local[2]", "--py-files", zip_path,
        os.path.join(ROOT, "scripts", "topk_job.py"),
        "--index", idx, "--query", "def return", "-k", "5",
    ])
    plain_rec = json.loads(
        [ln for ln in plain.splitlines() if ln.startswith("{")][-1]
    )
    out = _run([
        submit, "--master", "local[2]", "--py-files", zip_path,
        os.path.join(ROOT, "scripts", "topk_job.py"),
        "--index", idx, "--query", "def return", "-k", "5",
        "--must-not", "class",
    ])
    rec = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    )
    assert rec["must_not"] == ["class"]
    assert rec["topk"] != plain_rec["topk"]
    # surviving docs keep their EXACT unfiltered scores
    plain_scores = dict(plain_rec["topk"])
    for doc, score in rec["topk"]:
        if doc in plain_scores:
            assert score == plain_scores[doc]
