"""Tensor-seam bench: nn_extract_triples over sf0.001 transcripts
replicated with DUPLICATED turn text (distinct conv_ids), memo on vs
off — the evidence for BENCH/NN.md's inference-dedup numbers.

Usage: python tools/nn_bench.py [--replicate 4] [--master local[8]]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--replicate", type=int, default=4)
    parser.add_argument("--master", default="local[8]")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = parser.parse_args()

    from pyspark.sql import functions as F

    from information_extraction_spark.kernels import nn
    from information_extraction_spark.operators.nn_inference import (
        nn_extract_triples,
    )
    from information_extraction_spark.session import get_spark
    from information_extraction_spark.sources.from_documents import (
        kb_from_documents,
        transcripts_from_documents,
    )

    spark = get_spark(app_name="nn-bench", master=args.master)

    base = transcripts_from_documents(spark, args.sf_dir)
    # Duplicate-bearing corpus: same turn TEXT under distinct conv_ids
    # (a transcript corpus's real duplication mode — repeated
    # greetings/boilerplate across conversations), so the memo hits
    # but every replica still owes its own output rows.
    reps = spark.range(args.replicate).select(
        F.col("id").cast("string").alias("rep")
    )
    corpus = (
        base.crossJoin(F.broadcast(reps))
        .select(
            F.concat_ws("#", "conv_id", "rep").alias("conv_id"),
            "turn_idx",
            "role",
            "text",
            "tool",
            "ts",
        )
        .cache()
    )
    n_turns = corpus.count()

    _, schemas = kb_from_documents(spark, args.sf_dir)
    chars = sorted(
        r["c"]
        for r in base.select(
            F.explode(F.split("text", "")).alias("c")
        ).distinct().collect()
        if r["c"]
    )
    vocab = nn.build_char_vocab(chars)
    preds = sorted(
        r["predicate"]
        for r in schemas.select("predicate").distinct().collect()
    )
    for p in preds:
        vocab[p] = len(vocab)
    weights = nn.with_crf(
        nn.init_weights(len(vocab), n_predicates=len(preds), seed=11),
        seed=3,
    )

    results = {}
    for dedup in (False, True):
        # warmup then timed (same methodology as bench.py)
        nn_extract_triples(
            spark, corpus, schemas, weights, vocab, dedup=dedup
        ).count()
        t0 = time.time()
        n_triples = nn_extract_triples(
            spark, corpus, schemas, weights, vocab, dedup=dedup
        ).count()
        sec = time.time() - t0
        key = "memo_on" if dedup else "memo_off"
        results[key] = {
            "sec": round(sec, 2),
            "triples": n_triples,
            "triples_per_sec": round(n_triples / sec, 1),
        }
        print(
            json.dumps(
                {
                    "config": key,
                    "replicate": args.replicate,
                    "n_turns": n_turns,
                    **results[key],
                }
            )
        )
    if results["memo_on"]["triples"] != results["memo_off"]["triples"]:
        print("ERROR: memo changed the output row count", file=sys.stderr)
        return 1
    print(
        json.dumps(
            {
                "speedup": round(
                    results["memo_off"]["sec"]
                    / results["memo_on"]["sec"],
                    2,
                )
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
