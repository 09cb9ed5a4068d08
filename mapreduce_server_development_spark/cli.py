"""Command-line interface: job submission + engine status (F15/F16).

Mirrors the reference's two operational surfaces:

- ``mapreduce-submit`` (reference: mapreduce/submit.py:23-96) becomes
  ``python -m mapreduce_server_development_spark.cli submit`` with the
  same option names and defaults (4 mappers, 1 reducer, wc
  executables). The reference submit is fire-and-forget over TCP to a
  manager daemon; here the Spark action IS the job, so submit runs it
  synchronously and prints the output files — strictly more
  informative than the reference's "poll the output directory".
- ``bin/mapreduce start|stop|status`` (reference: bin/mapreduce:47-94)
  managed manager/worker daemons. Spark has no long-lived daemons in
  local mode — ``status`` reports the engine/session equivalent; start
  and stop are the SparkSession lifecycle inside ``submit`` itself.
"""

from __future__ import annotations

import argparse
import sys


def _cmd_submit(args: argparse.Namespace) -> int:
    from .operators.mapreduce import run_job
    from .session import get_spark

    spark = get_spark(app_name="mapreduce-submit")
    print(f"Submitted job to Spark {spark.version} ({spark.sparkContext.master})")
    print("input directory     ", args.input_directory)
    print("output directory    ", args.output_directory)
    print("mapper executable   ", args.mapper_executable)
    print("reducer executable  ", args.reducer_executable)
    print("num mappers         ", args.num_mappers)
    print("num reducers        ", args.num_reducers)
    outputs = run_job(
        spark,
        args.input_directory,
        args.output_directory,
        args.mapper_executable,
        args.reducer_executable,
        args.num_mappers,
        args.num_reducers,
        compat=not args.no_compat,
    )
    for o in outputs:
        print(o)
    return 0


def _cmd_status(_args: argparse.Namespace) -> int:
    from .session import get_spark

    spark = get_spark(app_name="mapreduce-status")
    sc = spark.sparkContext
    print(f"spark version={spark.version} master={sc.master} "
          f"parallelism={sc.defaultParallelism} appId={sc.applicationId}")
    return 0


def main(argv: list[str] | None = None) -> int:
    """Top-level CLI dispatch."""
    parser = argparse.ArgumentParser(prog="mapreduce-spark")
    sub = parser.add_subparsers(dest="verb", required=True)

    p = sub.add_parser("submit", help="run a MapReduce job (synchronous)")
    p.add_argument("-i", "--input", dest="input_directory",
                   default="tests/testdata/input")
    p.add_argument("-o", "--output", dest="output_directory", default="output")
    p.add_argument("-m", "--mapper", dest="mapper_executable",
                   default="tests/testdata/exec/wc_map.sh")
    p.add_argument("-r", "--reducer", dest="reducer_executable",
                   default="tests/testdata/exec/wc_reduce.sh")
    p.add_argument("--nmappers", dest="num_mappers", type=int, default=4)
    p.add_argument("--nreducers", dest="num_reducers", type=int, default=1)
    p.add_argument("--no-compat", action="store_true",
                   help="hash grouping (one shuffle) instead of byte-exact "
                        "distinct-line round-robin")
    p.set_defaults(func=_cmd_submit)

    p = sub.add_parser("status", help="print engine/session status")
    p.set_defaults(func=_cmd_status)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
