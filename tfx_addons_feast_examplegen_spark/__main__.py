"""CLI runner: the reference's orchestrated execution, as a command.

    python -m tfx_addons_feast_examplegen_spark \
        --registry registry.yaml \
        --entity-query "SELECT ... AS event_timestamp FROM ..." \
        --features user_events:value user_events:event_type \
        --sf-dir /root/testdata/sf0.001 \
        --output-dir /tmp/out --format parquet

Plays the role of the TFX orchestrator launching ``Executor.Do``
(reference ``executor.py:166-171``) for users without a pipeline runner.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tfx_addons_feast_examplegen_spark")
    p.add_argument("--registry", help="registry YAML file (default: fixture registry)")
    p.add_argument("--entity-query", required=True)
    p.add_argument(
        "--features",
        nargs="+",
        required=True,
        help="'view:feature' refs, or a single feature-service name",
    )
    p.add_argument("--sf-dir", required=True, help="directory of input tables")
    p.add_argument("--output-dir")
    p.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "tf_example", "tf_sequence_example"],
    )
    p.add_argument("--entity-ts-col", default="event_timestamp")
    p.add_argument("--show", type=int, default=5, help="rows to print (0=none)")
    args = p.parse_args(argv)

    from .registry import Registry, testdata_registry
    from .session import get_spark, register_tables
    from .sources.examplegen import generate_examples

    if args.registry:
        with open(args.registry) as f:
            registry = Registry.from_yaml(f.read())
    else:
        registry = testdata_registry()

    features: list[str] | str = (
        args.features[0]
        if len(args.features) == 1 and ":" not in args.features[0]
        else args.features
    )

    spark = get_spark("examplegen-cli")
    register_tables(spark, args.sf_dir)
    df = generate_examples(
        spark,
        registry=registry,
        entity_query=args.entity_query,
        features=features,
        sf_dir=args.sf_dir,
        output_dir=args.output_dir,
        entity_ts_col=args.entity_ts_col,
        output_format=args.format,
    )
    n = df.count()
    print(f"rows: {n}")
    if args.show:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
