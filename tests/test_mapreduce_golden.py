"""Golden-output tests for the MapReduce-compat job API.

Byte-exact comparison against the reference's own correct/*.txt files
(the reference's integration tests 01-03, SURVEY.md §5.1), run through
``run_job`` instead of manager/worker processes.
"""

from __future__ import annotations

import filecmp

import pytest

from .conftest import REF_TESTDATA, needs_reference

INPUT = REF_TESTDATA / "input"
EXEC = REF_TESTDATA / "exec"
CORRECT = REF_TESTDATA / "correct"


def _run(spark, tmp_path, mapper, reducer, nm, nr, compat=True):
    from mapreduce_server_development_spark.operators import run_job

    return run_job(
        spark,
        str(INPUT),
        str(tmp_path / "out"),
        str(EXEC / mapper),
        str(EXEC / reducer),
        nm,
        nr,
        compat=compat,
    )


@needs_reference
def test_wordcount_golden(spark, tmp_path):
    """Reference test_integration_02: wc 2 mappers / 1 reducer."""
    outs = _run(spark, tmp_path, "wc_map.sh", "wc_reduce.sh", 2, 1)
    assert len(outs) == 1
    assert filecmp.cmp(CORRECT / "word_count_correct.txt", outs[0], shallow=False)


@needs_reference
def test_grep_golden(spark, tmp_path):
    """Reference test_integration_01: grep 2 mappers / 1 reducer."""
    outs = _run(spark, tmp_path, "grep_map.py", "grep_reduce.py", 2, 1)
    assert len(outs) == 1
    assert filecmp.cmp(CORRECT / "grep_correct.txt", outs[0], shallow=False)


def _grep_expected(query: str) -> str:
    """Reference grep semantics computed in-process: map emits
    ``1\\t<line>`` for stripped non-empty lines containing ``query``
    (case-insensitive, grep_map.py:13-27), the group stage sorts all
    lines, grep_reduce.py prints the value column."""
    mapped: list[str] = []
    for f in sorted(INPUT.glob("*")):
        if f.name.startswith((".", "_")) or not f.is_file():
            continue
        for line in f.read_text(encoding="utf-8").splitlines():
            line = line.strip()
            if line and query in line.lower():
                mapped.append("1\t" + line)
    mapped.sort(key=lambda line: line + "\n")
    return "".join(line.split("\t", 1)[1] + "\n" for line in mapped)


@needs_reference
def test_grep_with_argument_list(spark, tmp_path):
    """Executable arguments, argv-list form: the reference's grep
    mapper takes an optional query term (grep_map.py:13-18) and
    submit.py accepts arbitrary executables — run_job must pass
    arguments through to the subprocess."""
    from mapreduce_server_development_spark.operators import run_job

    outs = run_job(
        spark,
        str(INPUT),
        str(tmp_path / "out"),
        [str(EXEC / "grep_map.py"), "money"],
        str(EXEC / "grep_reduce.py"),
        2,
        1,
    )
    assert len(outs) == 1
    with open(outs[0], encoding="utf-8") as f:
        assert f.read() == _grep_expected("money")


@needs_reference
def test_grep_with_argument_string(spark, tmp_path):
    """Executable arguments, shell-string form: ``"grep_map.py root"``
    is shlex-split into executable + argument."""
    from mapreduce_server_development_spark.operators import run_job

    outs = run_job(
        spark,
        str(INPUT),
        str(tmp_path / "out"),
        f"{EXEC / 'grep_map.py'} root",
        str(EXEC / "grep_reduce.py"),
        2,
        1,
    )
    assert len(outs) == 1
    with open(outs[0], encoding="utf-8") as f:
        assert f.read() == _grep_expected("root")


@needs_reference
def test_wordcount_multi_reducer(spark, tmp_path):
    """Reference test_integration_03: wc 4 mappers / 2 reducers — two
    output files whose sorted concatenation equals the golden bytes."""
    outs = _run(spark, tmp_path, "wc_map.sh", "wc_reduce.sh", 4, 2)
    assert len(outs) == 2
    lines: list[str] = []
    for o in outs:
        with open(o, encoding="utf-8") as f:
            lines += f.readlines()
    with open(CORRECT / "word_count_correct.txt", encoding="utf-8") as f:
        golden = f.readlines()
    assert sorted(lines) == sorted(golden)


@needs_reference
def test_wordcount_empty_token_line(spark, tmp_path):
    """E1 quirk: `tr` emits empty tokens; golden wc output keeps the
    bare `\\t9` line (SURVEY §2.2 E1)."""
    outs = _run(spark, tmp_path, "wc_map.sh", "wc_reduce.sh", 2, 1)
    with open(outs[0], encoding="utf-8") as f:
        first = f.readline()
    assert first == "\t9\n"


@needs_reference
def test_hash_grouping_same_reduce_results(spark, tmp_path):
    """compat=False (one-shuffle hash grouping) must produce the same
    multiset of reduce output lines as the golden run."""
    outs = _run(spark, tmp_path, "wc_map.sh", "wc_reduce.sh", 4, 2, compat=False)
    lines: list[str] = []
    for o in outs:
        with open(o, encoding="utf-8") as f:
            lines += f.readlines()
    with open(CORRECT / "word_count_correct.txt", encoding="utf-8") as f:
        golden = f.readlines()
    assert sorted(lines) == sorted(golden)


@needs_reference
def test_group_stage_round_robin_splits(spark):
    """F6 distinct-line round-robin: routing the golden mapper-output
    through the group stage reproduces the reference's reduce01/02
    files byte-exactly (reference test_manager_08)."""
    src = REF_TESTDATA / "test_manager_08/intermediate/job-0/mapper-output"
    golden_dir = REF_TESTDATA / "test_manager_08/correct/job-0/grouper-output"
    if not src.exists():
        pytest.skip("manager_08 fixtures not present")

    sc = spark.sparkContext
    files = sorted(str(p) for p in src.glob("file*"))
    mapped = sc.union([sc.textFile(f, 1).coalesce(1) for f in files])

    def sort_key(line):
        return line + "\n"

    n = 2
    ranks = mapped.distinct().sortBy(sort_key).zipWithIndex()
    grouped = (
        mapped.map(lambda line: (line, None))
        .join(ranks)
        .map(lambda kv: ((kv[1][1] % n, sort_key(kv[0])), kv[0]))
        .repartitionAndSortWithinPartitions(numPartitions=n, partitionFunc=lambda k: k[0])
    )
    parts = grouped.map(lambda kv: kv[1], preservesPartitioning=True).glom().collect()
    for i, name in enumerate(["reduce01", "reduce02"]):
        with open(golden_dir / name, encoding="utf-8") as f:
            golden = f.read()
        assert "".join(line + "\n" for line in parts[i]) == golden, name


def test_round_robin_partition():
    """F2: sorted file i → task i % n (reference manager test 05)."""
    from mapreduce_server_development_spark.operators import round_robin_partition

    files = [f"f0{i}" for i in range(1, 9)]
    tasks = round_robin_partition(files, 2)
    assert tasks[0] == ["f01", "f03", "f05", "f07"]
    assert tasks[1] == ["f02", "f04", "f06", "f08"]
    assert round_robin_partition([], 3) == [[], [], []]


@needs_reference
def test_output_overwrite(spark, tmp_path):
    """F8: re-running a job overwrites the output directory."""
    out = tmp_path / "out"
    out.mkdir()
    (out / "stale_file").write_text("stale")
    from mapreduce_server_development_spark.operators import run_job

    outs = run_job(
        spark,
        str(INPUT),
        str(out),
        str(EXEC / "grep_map.py"),
        str(EXEC / "grep_reduce.py"),
        2,
        1,
    )
    assert not (out / "stale_file").exists()
    assert len(outs) == 1


@needs_reference
def test_run_job_from_external_cwd(tmp_path):
    """Regression: closures shipped by run_job must serialize by value.

    A driver launched outside the repo root (cwd != /root/repo) has no
    way to import this package on its Python workers; module-level
    functions pickled by reference then fail with ModuleNotFoundError.
    Run the wc golden job in a subprocess whose cwd is the temp dir.
    """
    import subprocess
    import sys as _sys

    code = f"""
import sys
sys.path.insert(0, {str(REF_TESTDATA.parent.parent.parent / 'repo')!r})
sys.path.insert(0, '/root/repo')
import filecmp
from pyspark.sql import SparkSession
from mapreduce_server_development_spark.operators import run_job
spark = SparkSession.builder.master('local[4]').getOrCreate()
outs = run_job(spark, {str(INPUT)!r}, {str(tmp_path / 'out')!r},
               {str(EXEC / 'wc_map.sh')!r}, {str(EXEC / 'wc_reduce.sh')!r}, 2, 1)
assert filecmp.cmp({str(CORRECT / 'word_count_correct.txt')!r}, outs[0], shallow=False)
print('EXTERNAL_CWD_OK')
"""
    res = subprocess.run(
        [_sys.executable, "-c", code],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "EXTERNAL_CWD_OK" in res.stdout, res.stderr[-2000:]


@needs_reference
def test_task_retry_on_mapper_failure(tmp_path):
    """F13: a mapper that crashes on its first attempt is re-executed.

    The reference golden-tests dead-worker reassignment
    (test_manager_05); the Spark analog is task re-execution. The
    flaky mapper wins an atomic mkdir exactly once and exits 1 that
    time; with ``local[4,2]`` (2 task attempts) the retried attempt
    sees the marker, runs the real wc map, and the job completes
    byte-exact. Needs its own session (maxFailures is fixed at session
    creation), so it runs in a subprocess like the external-cwd test.
    Also guards checkCode=True: without it, the failed pipe would
    SILENTLY truncate output instead of failing the task.
    """
    import subprocess
    import sys as _sys

    marker = tmp_path / "failed_once"
    flaky = tmp_path / "flaky_wc_map.sh"
    flaky.write_text(
        "#!/bin/bash\n"
        "set -Eeuo pipefail\n"
        f"if mkdir {marker} 2>/dev/null; then\n"
        "  echo 'simulated worker death' >&2; exit 1\n"
        "fi\n"
        f"exec {EXEC / 'wc_map.sh'}\n"
    )
    flaky.chmod(0o755)
    code = f"""
import sys
sys.path.insert(0, '/root/repo')
import filecmp
from pyspark.sql import SparkSession
from mapreduce_server_development_spark.operators import run_job
spark = SparkSession.builder.master('local[4,2]').getOrCreate()
outs = run_job(spark, {str(INPUT)!r}, {str(tmp_path / 'out')!r},
               {str(flaky)!r}, {str(EXEC / 'wc_reduce.sh')!r}, 2, 1)
assert filecmp.cmp({str(CORRECT / 'word_count_correct.txt')!r}, outs[0], shallow=False)
print('RETRY_OK')
"""
    res = subprocess.run(
        [_sys.executable, "-c", code],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RETRY_OK" in res.stdout, res.stderr[-2000:]
    assert marker.exists()  # the failure really happened


@needs_reference
def test_mapper_failure_fails_job_not_truncates(spark, tmp_path):
    """A permanently-failing mapper must FAIL the job (checkCode=True),
    never silently produce partial output — the reference worker
    reports task failure to the manager rather than writing bad data."""
    bad = tmp_path / "bad_map.sh"
    bad.write_text("#!/bin/bash\nexit 3\n")
    bad.chmod(0o755)
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Py4JJavaError):
        _run_with(spark, tmp_path, str(bad), str(EXEC / "wc_reduce.sh"))


def _run_with(spark, tmp_path, mapper, reducer):
    from mapreduce_server_development_spark.operators import run_job

    return run_job(spark, str(INPUT), str(tmp_path / "out"), mapper, reducer, 2, 1)


@needs_reference
def test_concurrent_job_submission(spark, tmp_path):
    """F9 multi-job queueing (reference test_manager_04): two jobs
    submitted to the same engine at once both run to byte-exact
    completion. Spark's scheduler interleaves their stages across the
    shared executor pool — each thread's action is an independent job
    in the FIFO queue, no cross-talk in outputs."""
    import threading

    results: dict[str, list[str]] = {}
    errors: list[BaseException] = []

    def submit(tag, mapper, reducer):
        try:
            results[tag] = _run(
                spark, tmp_path / tag, mapper, reducer, 2, 1
            )
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    t1 = threading.Thread(
        target=submit, args=("wc", "wc_map.sh", "wc_reduce.sh")
    )
    t2 = threading.Thread(
        target=submit, args=("grep", "grep_map.py", "grep_reduce.py")
    )
    t1.start(); t2.start(); t1.join(120); t2.join(120)
    assert not errors, errors
    assert filecmp.cmp(
        CORRECT / "word_count_correct.txt", results["wc"][0], shallow=False
    )
    assert filecmp.cmp(
        CORRECT / "grep_correct.txt", results["grep"][0], shallow=False
    )


@needs_reference
def test_empty_input_directory(spark, tmp_path):
    """A job over an empty input directory still runs the reduce stage
    (the reference's reducers execute regardless of mapper output) and
    produces one EMPTY output file per reducer — no crash, no stale
    output dir."""
    from mapreduce_server_development_spark.operators import run_job

    empty_in = tmp_path / "empty"
    empty_in.mkdir()
    out = tmp_path / "out"
    outs = run_job(
        spark,
        str(empty_in),
        str(out),
        str(EXEC / "wc_map.sh"),
        str(EXEC / "wc_reduce.sh"),
        2,
        1,
    )
    assert [o.rsplit("/", 1)[1] for o in outs] == ["outputfile01"]
    with open(outs[0], encoding="utf-8") as f:
        assert f.read() == ""


@needs_reference
def test_input_files_with_hadoop_metachars(spark, tmp_path):
    """sc.textFile comma-splits and glob-expands its path string; file
    names containing , * ? [ ] { } must still be read byte-exactly
    (the reference worker opens files directly and accepts any name)."""
    from mapreduce_server_development_spark.operators import run_job

    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "a,b.txt").write_text("hello world\n")
    (indir / "log[1].txt").write_text("hello again\n")
    (indir / "plain.txt").write_text("world again\n")
    outs = run_job(
        spark,
        str(indir),
        str(tmp_path / "out"),
        str(EXEC / "wc_map.sh"),
        str(EXEC / "wc_reduce.sh"),
        num_reducers=1,
    )
    from pathlib import Path

    text = Path(outs[0]).read_text()
    counts = dict(
        line.split("\t") for line in text.strip().split("\n") if line
    )
    assert counts["hello"] == "2"
    assert counts["world"] == "2"
    assert counts["again"] == "2"
