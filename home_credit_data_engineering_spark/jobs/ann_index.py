"""ANN index build job CLI: embeddings parquet → cell-partitioned IVF
index (+ centroid matrix) for partition-pruned similarity serving.

The --output path must be LOCAL-filesystem: the centroid sidecar is
written with np.save (driver-local), unlike the parquet legs which go
through Spark's Hadoop filesystem. For hdfs:///s3:// deployments, stage
the sidecar locally and upload (see operators/quantization.py
build_ivfpq_index docstring for the same contract)."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Build a persisted IVF index (cell-partitioned parquet)"
    )
    parser.add_argument("--input", required=True, help="embeddings parquet path")
    parser.add_argument("--output", required=True, help="index path")
    parser.add_argument("--id-col", default="vec_id")
    parser.add_argument("--vec-col", default="embedding")
    parser.add_argument("--n-centroids", type=int, default=0,
                        help="0 = sqrt(N) (standard IVF sizing)")
    parser.add_argument("--train-rows", type=int, default=4096,
                        help="quantizer training sample size")
    parser.add_argument("--pq", action="store_true",
                        help="build an IVF-PQ index (codes ~16x smaller "
                        "than vectors; exact re-rank reads vectors/)")
    parser.add_argument("--pq-m", type=int, default=8,
                        help="PQ subquantizer count (must divide dim)")
    parser.add_argument("--pq-nbits", type=int, default=4,
                        help="bits per PQ code (2^nbits codewords/sub)")
    parser.add_argument("--residual", action="store_true",
                        help="IVFADC residual quantization (requires "
                        "--pq): codes quantize x - centroid(cell)")
    parser.add_argument("--opq", action="store_true",
                        help="learn an OPQ rotation first (requires --pq); "
                        "the whole index builds in the rotated space and "
                        "the query path auto-detects the saved rotation")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.residual and not args.pq:
        raise SystemExit("--residual requires --pq")
    if args.opq and not args.pq:
        raise SystemExit("--opq requires --pq")
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.sources.readers import read_parquet

    spark = get_session(app_name="ann-index-build")
    emb = read_parquet(spark, args.input)
    n = emb.count()
    n_cells = args.n_centroids or max(16, int(n**0.5))
    train_frac = min(1.0, args.train_rows / n) if n > args.train_rows else None
    if args.pq:
        from home_credit_data_engineering_spark.operators.quantization import (
            build_ivfpq_index,
        )

        centers, _books = build_ivfpq_index(
            emb,
            args.output,
            id_col=args.id_col,
            vec_col=args.vec_col,
            n_centroids=n_cells,
            m=args.pq_m,
            nbits=args.pq_nbits,
            train_fraction=train_frac,
            residual=args.residual,
            opq=args.opq,
        )
        kind = "ivfpq-residual" if args.residual else "ivfpq"
        if args.opq:
            kind += "-opq"
    else:
        from home_credit_data_engineering_spark.operators.similarity import (
            build_ivf_index,
        )

        centers = build_ivf_index(
            emb,
            args.output,
            id_col=args.id_col,
            vec_col=args.vec_col,
            n_centroids=n_cells,
            train_fraction=train_frac,
        )
        kind = "ivf"
    print(
        f"ann_index[{kind}]: {n} vectors -> {len(centers)} cells at "
        f"{args.output}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
