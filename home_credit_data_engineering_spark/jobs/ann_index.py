"""ANN index job CLI: build (embeddings parquet → cell-partitioned IVF
or IVF-PQ index), O(Δ) increment (--state-dir), drift report
(--report-drift), and serving (--query-ids: partition-pruned top-k for
query vectors drawn from a parquet source by id).

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
    parser.add_argument("--input",
                        help="embeddings parquet path (required for every "
                        "mode except --report-drift, which reads only the "
                        "index sidecars)")
    parser.add_argument("--output",
                        help="index path (full build mode; or use --state-dir)")
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
    parser.add_argument("--state-dir",
                        help="incremental mode (instead of --output): the "
                        "persisted index directory. First run (no index "
                        "there yet) does the full build; later runs treat "
                        "--input as a batch of NEW vectors and fold it in "
                        "O(batch) — append into the existing cell "
                        "partitions under frozen centroids, update the "
                        "per-cell drift stats, print the drift report")
    parser.add_argument("--mean-shift-threshold", type=float, default=0.2,
                        help="incremental mode: recommend a rebuild when "
                        "any cell's running mean direction drifts more "
                        "than this (1 - cosine) from its centroid")
    parser.add_argument("--imbalance-threshold", type=float, default=8.0,
                        help="incremental mode: recommend a rebuild when "
                        "max/mean cell size exceeds this")
    parser.add_argument("--rebuild-on-drift", action="store_true",
                        help="incremental mode: when a drift threshold "
                        "trips, retrain the full index from the stored "
                        "vectors into a staged sibling and swap it in "
                        "(two-phase, crash-safe)")
    parser.add_argument("--report-drift", action="store_true",
                        help="report mode: print the current drift report "
                        "for the --state-dir index (stats + centroids "
                        "sidecars only -- no data scan, no ingest)")
    parser.add_argument("--tune-probes", nargs="*", type=int, default=None,
                        help="tuning mode: probe counts to sweep; prints "
                        "the recall@k-vs-scan-fraction frontier of the "
                        "persisted index against exact brute force over "
                        "a sample of --input vectors (--k rows each)")
    parser.add_argument("--tune-sample", type=int, default=50,
                        help="tuning mode: number of query vectors sampled "
                        "from --input (seeded)")
    parser.add_argument("--query-ids", nargs="*", type=int, default=None,
                        help="query mode: vector ids; reads their "
                        "embeddings from --input and prints top-k "
                        "neighbors from the --state-dir index")
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--n-probe", type=int, default=4)
    return parser


def _full_build(
    emb,
    out: str,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    train_rows: int,
    pq: bool,
    pq_m: int,
    pq_nbits: int,
    residual: bool,
    opq: bool,
) -> str:
    """Full (re)train+write of the index at ``out``; returns a summary."""
    n = emb.count()
    n_cells = n_centroids or max(16, int(n**0.5))
    train_frac = min(1.0, train_rows / n) if n > train_rows else None
    if pq:
        from home_credit_data_engineering_spark.operators.quantization import (
            build_ivfpq_index,
        )

        centers, _books = build_ivfpq_index(
            emb,
            out,
            id_col=id_col,
            vec_col=vec_col,
            n_centroids=n_cells,
            m=pq_m,
            nbits=pq_nbits,
            train_fraction=train_frac,
            residual=residual,
            opq=opq,
        )
        kind = "ivfpq-residual" if residual else "ivfpq"
        if opq:
            kind += "-opq"
    else:
        from home_credit_data_engineering_spark.operators.similarity import (
            build_ivf_index,
        )

        centers = build_ivf_index(
            emb,
            out,
            id_col=id_col,
            vec_col=vec_col,
            n_centroids=n_cells,
            train_fraction=train_frac,
        )
        kind = "ivf"
    return f"ann_index[{kind}]: {n} vectors -> {len(centers)} cells at {out}"


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.residual and not args.pq:
        raise SystemExit("--residual requires --pq")
    if args.opq and not args.pq:
        raise SystemExit("--opq requires --pq")
    if (
        args.report_drift
        or args.query_ids is not None
        or args.tune_probes is not None
    ) and not args.state_dir:
        raise SystemExit(
            "--report-drift/--query-ids/--tune-probes need --state-dir"
        )
    if not args.state_dir and not args.output:
        raise SystemExit("--output is required (or use --state-dir)")
    if args.input is None and not args.report_drift:
        raise SystemExit("--input is required (except with --report-drift)")
    import os

    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.sources.readers import read_parquet

    spark = get_session(app_name="ann-index-build")

    if args.report_drift:
        import numpy as np

        from home_credit_data_engineering_spark.operators.ann_state import (
            _stats_path,
            drift_report,
            read_cell_stats,
        )
        from home_credit_data_engineering_spark.sources.maintenance import (
            recover_fold_commits,
            recover_state_swap,
        )

        centers = np.load(os.path.join(args.state_dir, "_centroids.npy"))
        deltas_dir = os.path.join(args.state_dir, "_cell_stats_deltas")
        # recover a mid-swap deltas dir BEFORE layout detection: a
        # compaction that died between rmtree and rename leaves only
        # __next, which would misclassify a streaming index as
        # batch-maintained (and then write a _cell_stats sidecar onto it)
        recover_state_swap(deltas_dir)
        if os.path.isdir(deltas_dir):
            # streaming-maintained index: running state is the sum of
            # the batch-keyed deltas, not a _cell_stats snapshot
            from home_credit_data_engineering_spark.streaming.ann import (
                read_streaming_cell_stats,
            )

            rows = read_streaming_cell_stats(spark, args.state_dir).collect()
        else:
            # a prior increment may have died mid-swap on the stats dir;
            # apply the same recovery the increment path itself runs —
            # fold-commit markers first (they FINISH a committed swap the
            # generic rule would discard), then the generic rule
            recover_fold_commits(
                args.state_dir, [_stats_path(args.state_dir)]
            )
            recover_state_swap(_stats_path(args.state_dir))
            if not os.path.isdir(_stats_path(args.state_dir)):
                # pre-stats index: same one-time lazy init the
                # increment path performs
                from home_credit_data_engineering_spark.operators.ann_state import (
                    refresh_cell_stats_from_index,
                )

                refresh_cell_stats_from_index(
                    spark, args.state_dir, args.id_col, args.vec_col
                )
            rows = read_cell_stats(spark, args.state_dir).collect()
        rep = drift_report(
            rows, centers, args.mean_shift_threshold, args.imbalance_threshold
        )
        print(
            "ann_index[drift]: n_vectors=%d cells=%d max_mean_shift=%.4f "
            "size_imbalance=%.2f rebuild_recommended=%s (trigger=%s)"
            % (rep["n_vectors"], rep["n_cells"], rep["max_mean_shift"],
               rep["size_imbalance"], rep["rebuild_recommended"],
               rep["trigger"])
        )
        if (
            rep["rebuild_recommended"]
            and args.rebuild_on_drift
            and os.path.isdir(deltas_dir)
        ):
            # stream→batch handoff: the streamed maintainers (the PQ one
            # deliberately — a codebook retrain invalidates every stored
            # code) report drift but leave the rebuild to this CLI. Run
            # with the stream STOPPED; it resumes against the rebuilt
            # tree (same path, same checkpoint, fresh sidecars).
            n_vec = rep["n_vectors"]
            frac = (
                min(1.0, args.train_rows / n_vec)
                if n_vec > args.train_rows
                else None
            )
            if os.path.isdir(os.path.join(args.state_dir, "codes")):
                from home_credit_data_engineering_spark.streaming.ann import (
                    rebuild_streamed_ivfpq_index,
                )

                res = rebuild_streamed_ivfpq_index(
                    spark, args.state_dir,
                    id_col=args.id_col, vec_col=args.vec_col,
                    n_centroids=args.n_centroids or None,
                    train_fraction=frac,
                )
                kind = "ivfpq"
            else:
                from home_credit_data_engineering_spark.streaming.ann import (
                    rebuild_streamed_ivf_index,
                )

                res = rebuild_streamed_ivf_index(
                    spark, args.state_dir,
                    id_col=args.id_col, vec_col=args.vec_col,
                    n_centroids=args.n_centroids or None,
                    train_fraction=frac,
                )
                kind = "ivf"
            print(
                "ann_index[rebuild-streamed-%s]: %d vectors -> %d cells "
                "at %s (drift rebuild; resume the stream against the "
                "new tree)"
                % (kind, res["n_vectors"], res["n_cells"], args.state_dir)
            )
        return 0

    if args.tune_probes is not None:
        from home_credit_data_engineering_spark.operators.ann_state import (
            tune_probes,
        )

        src = read_parquet(spark, args.input)
        n = src.count()
        frac = min(1.0, (args.tune_sample * 1.2) / n) if n else 1.0
        sample = src.sample(fraction=frac, seed=7).limit(args.tune_sample)
        frontier = tune_probes(
            spark, args.state_dir, sample, k=args.k,
            probes=tuple(args.tune_probes or (1, 2, 4, 8)),
            id_col=args.id_col, vec_col=args.vec_col,
        )
        for r in frontier.collect():
            print(
                "ann_index[tune]: n_probe=%-4d recall@%d=%.4f "
                "scan_fraction=%.4f"
                % (r["n_probe"], args.k, r["recall_at_k"],
                   r["scan_fraction"])
            )
        return 0

    if args.query_ids is not None:
        from pyspark.sql import functions as F

        queries = read_parquet(spark, args.input).filter(
            F.col(args.id_col).isin(args.query_ids)
        )
        is_pq = os.path.isdir(os.path.join(args.state_dir, "codes"))
        if is_pq:
            from home_credit_data_engineering_spark.operators.quantization import (
                ivfpq_query_index,
            )

            top = ivfpq_query_index(
                spark, args.state_dir, queries, k=args.k,
                id_col=args.id_col, vec_col=args.vec_col,
                n_probe=args.n_probe,
            )
        else:
            from home_credit_data_engineering_spark.operators.similarity import (
                ivf_query_index,
            )

            top = ivf_query_index(
                spark, args.state_dir, queries, k=args.k,
                id_col=args.id_col, vec_col=args.vec_col,
                n_probe=args.n_probe,
            )
        for row in top.orderBy("query_id", "rank").collect():
            print(
                f"{row['query_id']}\t{row['rank']}\t{row['neighbor_id']}\t"
                f"{row['score']}"
            )
        return 0

    emb = read_parquet(spark, args.input)

    if not args.state_dir:
        print(
            _full_build(
                emb, args.output, args.id_col, args.vec_col,
                args.n_centroids, args.train_rows, args.pq, args.pq_m,
                args.pq_nbits, args.residual, args.opq,
            )
        )
        return 0

    from home_credit_data_engineering_spark.sources.maintenance import (
        carry_ledger,
        recover_state_swap,
        staged_state_path,
        swap_in_state,
    )

    idx = args.state_dir
    recover_state_swap(idx)
    if not os.path.exists(os.path.join(idx, "_centroids.npy")):
        # bootstrap: first batch trains and writes the whole index
        print(
            _full_build(
                emb, idx, args.id_col, args.vec_col, args.n_centroids,
                args.train_rows, args.pq, args.pq_m, args.pq_nbits,
                args.residual, args.opq,
            )
        )
        return 0

    is_pq = os.path.isdir(os.path.join(idx, "codes"))
    from home_credit_data_engineering_spark.operators.ann_state import (
        ivf_index_increment,
        ivfpq_index_increment,
    )

    fold = ivfpq_index_increment if is_pq else ivf_index_increment
    report = fold(
        emb,
        idx,
        id_col=args.id_col,
        vec_col=args.vec_col,
        mean_shift_threshold=args.mean_shift_threshold,
        imbalance_threshold=args.imbalance_threshold,
    )
    print(
        "ann_index[increment%s]: +%d vectors, max_mean_shift=%.4f, "
        "size_imbalance=%.2f, rebuild_recommended=%s (trigger=%s)"
        % (
            "-pq" if is_pq else "",
            report["appended"],
            report["max_mean_shift"],
            report["size_imbalance"],
            report["rebuild_recommended"],
            report["trigger"],
        )
    )
    if report["rebuild_recommended"] and args.rebuild_on_drift:
        import shutil

        import numpy as np

        # Retrain from the stored vectors into a staged sibling, then
        # swap (shared two-phase helper). PQ geometry is inferred from
        # the stored sidecars so the rebuild matches the original build.
        if is_pq:
            src = spark.read.parquet(os.path.join(idx, "vectors")).select(
                args.id_col, args.vec_col
            )
            books = np.load(os.path.join(idx, "_codebooks.npy"))
            pq_m, n_codes = books.shape[0], books.shape[1]
            pq_nbits = int(n_codes).bit_length() - 1
            residual = bool(np.load(os.path.join(idx, "_residual.npy"))[0])
            opq = os.path.exists(os.path.join(idx, "_rotation.npy"))
        else:
            src = spark.read.parquet(idx).select(args.id_col, args.vec_col)
            pq_m, pq_nbits, residual, opq = args.pq_m, args.pq_nbits, False, False
        staged = staged_state_path(idx)
        if os.path.isdir(staged):
            shutil.rmtree(staged)
        # keep the stored cell count unless explicitly overridden: a
        # routine cron without --n-centroids must not silently change
        # the index geometry the query-side n_probe was tuned for
        n_cells = args.n_centroids or len(
            np.load(os.path.join(idx, "_centroids.npy"))
        )
        msg = _full_build(
            src, staged, args.id_col, args.vec_col, n_cells,
            args.train_rows, is_pq, pq_m, pq_nbits, residual, opq,
        )
        # the processed-delta ledger must survive the rebuild: every
        # folded delta's vectors are in the retrain source, so replaying
        # an old fold against the NEW tree must still no-op
        carry_ledger(idx, staged)
        # the PQ layout keeps its _SUCCESS markers inside codes/ and
        # vectors/; the swap helper wants one at the staged root
        open(os.path.join(staged, "_SUCCESS"), "a").close()
        swap_in_state(idx)
        print(msg.replace(staged, idx) + " (drift rebuild)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
