"""Ultimate eval parity: run the REFERENCE's own evaluation script
(/root/reference/legacy/labeling/bert/bin/evaluation/calc_pr.py,
executed read-only as an external oracle — no code copied) on the
same golden/predicted data our Spark calc_pr consumes, and require
identical rounded P/R/F1.

Skipped automatically when the reference checkout is absent.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pandas as pd
import pytest

from information_extraction_spark import schemas as S
from information_extraction_spark.operators.evaluation import calc_pr
from information_extraction_spark.plans.pipeline import extract_triples

CALC_PR = "/root/reference/legacy/labeling/bert/bin/evaluation/calc_pr.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CALC_PR), reason="reference checkout not present"
)


def _spo_lines(pdf: pd.DataFrame) -> list[str]:
    lines = []
    for text, grp in pdf.groupby("text", sort=True):
        spo = [
            {
                "subject": r.subject,
                "predicate": r.predicate,
                "object": r.object,
                "subject_type": getattr(r, "subject_type", ""),
                "object_type": getattr(r, "object_type", ""),
            }
            for r in grp.itertuples()
        ]
        lines.append(json.dumps({"text": text, "spo_list": spo}, ensure_ascii=False))
    return lines


def _run_official(
    tmp_dir: str, pred_pdf: pd.DataFrame, gold_pdf: pd.DataFrame, alias: dict | None
) -> tuple[float, float, float]:
    golden_path = os.path.join(tmp_dir, "golden.json")
    with open(golden_path, "w", encoding="utf-8") as f:
        f.write("\n".join(_spo_lines(gold_pdf)) + "\n")
    pred_json = os.path.join(tmp_dir, "predict.json")
    with open(pred_json, "w", encoding="utf-8") as f:
        f.write("\n".join(_spo_lines(pred_pdf)) + "\n")
    pred_zip = os.path.join(tmp_dir, "predict.zip")
    with zipfile.ZipFile(pred_zip, "w") as z:
        z.write(pred_json, arcname="predict.json")
    args = [
        sys.executable,
        CALC_PR,
        "--golden_file",
        golden_path,
        "--predict_file",
        pred_zip,
    ]
    if alias:
        alias_path = os.path.join(tmp_dir, "alias.tsv")
        with open(alias_path, "w", encoding="utf-8") as f:
            for k, vals in alias.items():
                f.write(k + "\t" + "\t".join(sorted(vals)) + "\n")
        args += ["--alias_file", alias_path]
    out = subprocess.run(args, capture_output=True, text=True, check=True)
    result = json.loads(out.stdout.strip().splitlines()[-1])
    data = {d["name"]: d["value"] for d in result["data"]}
    return data["precision"], data["recall"], data["f1-score"]


def _spark_prf(spark, pred_pdf, gold_pdf, alias=None):
    pred = spark.createDataFrame(
        pred_pdf[["text", "subject", "predicate", "object"]]
    )
    gold = spark.createDataFrame(
        gold_pdf[["text", "subject", "predicate", "object"]]
    )
    alias_df = None
    if alias:
        rows = [(k, a) for k, vs in alias.items() for a in vs]
        alias_df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["canonical", "alias"])
        )
    row = calc_pr(pred, gold, alias_df=alias_df).collect()[0]
    return row["precision"], row["recall"], row["f1"]


def test_official_script_parity_on_pipeline_output(
    spark, world, transcripts_pdf, golden_pdf, tmp_dir
):
    """Noisy-KB pipeline output scored by the official script must
    match our Spark calc_pr exactly (rounded 4dp)."""
    tdf = spark.createDataFrame(transcripts_pdf, schema=S.TRANSCRIPTS)
    kb = spark.createDataFrame(world.kb_noisy, schema=S.KNOWLEDGE_BASE)
    sch = spark.createDataFrame(world.schemas, schema=S.RELATION_SCHEMAS)
    pred_pdf = extract_triples(spark, tdf, kb, sch).toPandas()

    official = _run_official(tmp_dir, pred_pdf, golden_pdf, alias=None)
    ours = _spark_prf(spark, pred_pdf, golden_pdf)
    assert ours == official
    # And the official score itself clears the BASELINE gate.
    assert official[0] >= 0.95 and official[1] >= 0.95


def test_official_script_parity_with_alias_dict(spark, tmp_dir):
    """Handcrafted fixture where book-name, case, and alias rules all
    fire — official script vs Spark calc_pr."""
    gold_rows = [
        ("s1", "端脑", "主演", "朱元冰"),
        ("s1", "端脑", "导演", "于中中"),
        ("s2", "alice zhang", "founder", "acme corp"),
        ("s3", "碑", "出版社", "上海社"),
        ("s4", "only golden", "rel", "missing"),
        ("s6", "x8", "rel", "y8"),
    ]
    pred_rows = [
        ("s1", "《端脑》", "主演", "朱元冰"),
        ("s1", "端脑", "导演", "错人"),
        ("s2", "Alice Zhang", "founder", "ACME CORP"),
        ("s3", "石碑", "出版社", "上海社"),
        ("s5", "not in golden", "rel", "ignored"),
        # Mixed endpoints: subject matches gold directly while itself
        # having aliases; object matches only via alias (the
        # s_alias_set.add(s) identity-member rule in the script).
        ("s6", "x8", "rel", "y8-alias"),
    ]
    alias = {"石碑": {"碑"}, "x8": {"x8-other"}, "y8-alias": {"y8"}}
    cols = ["text", "subject", "predicate", "object"]
    pred_pdf = pd.DataFrame(pred_rows, columns=cols)
    gold_pdf = pd.DataFrame(gold_rows, columns=cols)
    official = _run_official(tmp_dir, pred_pdf, gold_pdf, alias)
    ours = _spark_prf(spark, pred_pdf, gold_pdf, alias)
    assert ours == official
