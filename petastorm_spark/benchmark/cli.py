"""Measure Reader throughput on a dataset (reference parity:
petastorm-throughput.py, petastorm/benchmark/cli.py).

    python -m petastorm_spark.benchmark.cli file:///path/to/dataset \
        --workers-count 4 --pool-type thread -m 200 -n 1000
"""

from __future__ import annotations

import argparse
import sys

from petastorm_spark.benchmark.throughput import reader_throughput


def _parse_args(argv):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawTextHelpFormatter
    )
    p.add_argument("dataset_path", type=str, help="Path/URL of the dataset")
    p.add_argument(
        "--field-regex",
        type=str,
        nargs="+",
        help="Only fields matching one of these regexes are read",
    )
    p.add_argument("-w", "--workers-count", type=int, default=3)
    p.add_argument(
        "-p",
        "--pool-type",
        type=str,
        default="thread",
        choices=["thread", "process", "dummy"],
    )
    p.add_argument("-m", "--warmup-cycles", type=int, default=200)
    p.add_argument("-n", "--measure-cycles", type=int, default=1000)
    p.add_argument(
        "--read-method",
        type=str,
        default="python",
        choices=["python", "batch"],
        help="python = decoded rows (make_reader); batch = column batches",
    )
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = _parse_args(argv if argv is not None else sys.argv[1:])
    result = reader_throughput(
        args.dataset_path,
        field_regex=args.field_regex,
        warmup_cycles=args.warmup_cycles,
        measure_cycles=args.measure_cycles,
        pool_type=args.pool_type,
        workers_count=args.workers_count,
        read_method=args.read_method,
    )
    unit = "batches" if result.batched else "samples"
    print(f"{result.samples_per_second:.2f} {unit}/sec")
    if result.rss_mb is not None:
        print(
            f"rss: {result.rss_mb:.1f} MB tree "
            f"({result.rss_main_mb:.1f} main / {result.rss_iter_mb:.1f} iter + {result.rss_jvm_mb:.1f} jvm), "
            f"cpu: {result.cpu_pct:.1f}%"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
