"""Corpus-curation CLI — run the configured pre-training pipeline over a
parquet documents table and publish a layout-controlled dataset.

    singer-spark-curate --input /data/documents.parquet \\
        --output /data/curated --dedup minhash --lang en --min-quality 0.5 \\
        --partition-by split --benchmark /path/to/eval_docs.parquet

(or `python tools/curate.py ...` from a source checkout.)

The operator composition is `singer_spark.curation.curate` (the
oracle-checked `corpus_pipeline_full` registry query is its single-plan
twin); the write path is `sinks.write_dataset`.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="output dataset dir")
    p.add_argument("--lang", default="en",
                   help="keep docs predicted as this language ('' disables)")
    p.add_argument("--min-quality", type=float, default=0.5,
                   help="quality-score floor (negative disables)")
    p.add_argument("--no-repetition-screen", action="store_true")
    p.add_argument("--quality-model-seed", default=None, metavar="SQL",
                   help="SQL boolean over the input columns marking the "
                        "high-quality seed set (e.g. \"source = 'wiki'\"); "
                        "enables the learned NB quality gate "
                        "(CCNet-style) alongside the heuristic floor")
    p.add_argument("--quality-model-threshold", type=float, default=0.0,
                   help="learned-gate llr floor (keep if llr > this)")
    p.add_argument("--quality-model-path", default=None, metavar="DIR",
                   help="pre-trained NB model dir (save_nb_model): apply "
                        "without refitting — use for streaming/incremental "
                        "runs where per-batch refits would drift the gate")
    p.add_argument("--dedup", default="exact",
                   choices=["none", "exact", "minhash", "semantic",
                            "spans"])
    p.add_argument("--span-min-run", type=int, default=16,
                   help="spans backend: cut duplicated runs of >= this "
                        "many tokens (Lee et al. minimum length)")
    p.add_argument("--benchmark", default=None,
                   help="eval-set parquet for k-gram decontamination")
    p.add_argument("--decontaminate-mode", default="drop",
                   choices=("drop", "spans"),
                   help="drop whole contaminated docs, or cut only the "
                        "shared k-gram windows (spans)")
    p.add_argument("--contamination-report", default=None, metavar="PATH",
                   help="with --benchmark: also write the per-benchmark-"
                        "item leak report (bench_id, n_leaked_docs, "
                        "n_leaked_grams) to this parquet path")
    p.add_argument("--length-match-ref", default=None, metavar="PATH",
                   help="reference parquet whose token-length distribution "
                        "the surviving corpus is importance-resampled to "
                        "(applied AFTER the gates, before publish)")
    p.add_argument("--redact-pii", action="store_true",
                   help="scrub emails/IPv4s/phone numbers from the "
                        "PUBLISHED text (applied last; gates and dedup "
                        "digests see the original bytes)")
    p.add_argument("--pii-pattern", action="append", default=None,
                   metavar="NAME=REGEX=TOKEN",
                   help="repeatable: custom PII pattern registry entry "
                        "(e.g. ssn='\\d{3}-\\d{2}-\\d{4}'=<SSN>); when "
                        "given, REPLACES the default email/ipv4/phone set "
                        "— restate the defaults to keep them.  Implies "
                        "--redact-pii.  Counts are always taken on the "
                        "original text; replacements chain in the order "
                        "given (the count-then-replace contract)")
    p.add_argument("--no-split", action="store_true")
    p.add_argument("--pack-batches", type=int, default=None, metavar="LEN",
                   help="also tokenize the published survivors (unigram "
                        "vocab: --vocab-path or trained on them) and "
                        "write the LEN-piece training-window layout "
                        "(curation.corpus_to_batches) next to the output")
    p.add_argument("--vocab-path", default=None, metavar="DIR",
                   help="persisted tokenizer vocabulary (save_vocab) for "
                        "--pack-batches; omitted = train on the survivors")
    p.add_argument("--vocab-size", type=int, default=None, metavar="N",
                   help="--pack-batches without --vocab-path: train with "
                        "the shrink-to-target loop to exactly N "
                        "multi-char pieces (unigram_train_to_size) "
                        "instead of the one-shot keep-ratio prune")
    p.add_argument("--batches-output", default=None, metavar="DIR",
                   help="where --pack-batches writes (default "
                        "<output>_batches)")
    p.add_argument("--train-split-only", action="store_true",
                   help="--pack-batches: pack only split='train' docs")
    p.add_argument("--partition-by", default=None,
                   help="comma-separated hive partition columns")
    p.add_argument("--zorder-by", default=None,
                   help="comma-separated Z-order layout columns")
    p.add_argument("--target-file-mb", type=float, default=None)
    args = p.parse_args(argv)

    from singer_spark.curation import CurationConfig, curate_and_publish
    from singer_spark.operators.text_analysis import parse_pii_pattern
    from singer_spark.session import get_spark

    spark = get_spark("singer_spark_curate")
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    cfg = CurationConfig(
        lang=args.lang or None,
        min_quality=None if args.min_quality < 0 else args.min_quality,
        repetition_screen=not args.no_repetition_screen,
        dedup=args.dedup,
        quality_model_seed=args.quality_model_seed,
        quality_model_threshold=args.quality_model_threshold,
        quality_model_path=args.quality_model_path,
        span_min_run=args.span_min_run,
        decontaminate_mode=args.decontaminate_mode,
        redact_pii=args.redact_pii or bool(args.pii_pattern),
        pii_patterns=(tuple(parse_pii_pattern(s) for s in args.pii_pattern)
                      if args.pii_pattern else None),
        split=not args.no_split,
    )
    if args.contamination_report and bench is not None:
        from singer_spark.operators.text_analysis import contamination_report

        (contamination_report(docs, bench)
         .write.mode("overwrite").parquet(args.contamination_report))
        print(f"wrote contamination report to {args.contamination_report}")
    if args.length_match_ref:
        from pyspark.sql import functions as F

        from singer_spark.curation import curate
        from singer_spark.operators.text_analysis import length_matched_sample
        from singer_spark.sinks import write_dataset

        kept = curate(docs, cfg, benchmark=bench)
        ref = spark.read.parquet(args.length_match_ref)
        keep_ids = (length_matched_sample(kept, ref)
                    .where("kept").select(F.col("id").alias(cfg.id_col)))
        matched = kept.join(keep_ids, cfg.id_col, "left_semi")
        write_dataset(
            matched, args.output,
            partition_by=args.partition_by.split(",") if args.partition_by else None,
            zorder_by=args.zorder_by.split(",") if args.zorder_by else None,
            target_file_mb=args.target_file_mb)
        n = spark.read.parquet(args.output).count()
    else:
        n = curate_and_publish(
            docs, args.output, cfg, benchmark=bench,
            partition_by=args.partition_by.split(",") if args.partition_by else None,
            zorder_by=args.zorder_by.split(",") if args.zorder_by else None,
            target_file_mb=args.target_file_mb)
    print(f"published {n} documents to {args.output}")
    if args.pack_batches:
        from singer_spark.curation import corpus_to_batches

        packed = corpus_to_batches(
            docs, cfg, benchmark=bench,
            curated=spark.read.parquet(args.output),
            vocab_path=args.vocab_path,
            train_split_only=args.train_split_only,
            max_len=args.pack_batches,
            target_multi=args.vocab_size)
        out = args.batches_output or (args.output.rstrip("/") + "_batches")
        packed.write.mode("overwrite").parquet(out)
        rep = spark.read.parquet(out).limit(1).collect()
        if rep:
            r = rep[0]
            print(f"packed {r.n_docs} docs / {r.total_tokens} pieces into "
                  f"{r.n_windows} x {args.pack_batches}-piece windows "
                  f"at {out}")
    spark.stop()


if __name__ == "__main__":
    main()
