"""IVF partitioned-layout ANN: partition pruning + exactness within the
probed cells (operators/ann.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wukong_spark.operators.ann import ivf_build_partitioned, ivf_probe_pruned

SF_DIR = "/root/testdata/sf0.01"
K_CELLS = 8
NPROBE = 2


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pdf = df.select("vec_id", "embedding").toPandas()
    pdf["embedding"] = pdf["embedding"].map(lambda v: np.asarray(v, dtype=float))
    return df, pdf


@pytest.fixture(scope="module")
def index_path(spark, corpus, tmp_path_factory):
    df, pdf = corpus
    cents = np.vstack(
        pdf.set_index("vec_id").loc[range(20, 20 + K_CELLS), "embedding"].to_numpy()
    )
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_build_partitioned(df, cents, path)
    return path, cents


def test_build_layout_one_dir_per_cell(spark, index_path):
    path, _ = index_path
    cells = spark.read.parquet(path).select("cell").distinct().collect()
    assert 1 < len(cells) <= K_CELLS
    # partition column materialized as directories, not data files
    files = spark.read.parquet(path).inputFiles()
    assert all("cell=" in f for f in files)


def test_probe_scans_only_probed_partitions(spark, index_path, corpus):
    path, cents = index_path
    _, pdf = corpus
    queries = {1: pdf.loc[pdf.vec_id == 1, "embedding"].iloc[0]}
    out = ivf_probe_pruned(spark, path, cents, queries, nprobe=NPROBE, k=5)
    # plan-level check: the cell shortlist reached the parquet scan as a
    # PARTITION filter (pruning happens before any row/file is read —
    # inputFiles() reports the unpruned listing, so the plan is the probe)
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([0-9,]+)\)", plan)
    assert m, f"no partition isin filter in plan:\n{plan[:2000]}"
    probed = m.group(1).split(",")
    assert 0 < len(probed) <= NPROBE < K_CELLS


def test_probe_matches_numpy_oracle_within_cells(spark, index_path, corpus):
    path, cents = index_path
    _, pdf = corpus
    q_ids = [1, 3]
    queries = {q: pdf.loc[pdf.vec_id == q, "embedding"].iloc[0] for q in q_ids}
    out = (
        ivf_probe_pruned(spark, path, cents, queries, nprobe=NPROBE, k=5)
        .orderBy("q_id", "rn")
        .toPandas()
    )

    # numpy oracle: same assignment, same probe shortlist, same ranking
    mat = np.vstack(pdf["embedding"].to_numpy())
    nrm = np.linalg.norm(mat, axis=1)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    cell_of = np.argmax((mat / nrm[:, None]) @ cn.T, axis=1)  # ties: lowest c_id wins
    expected = []
    for q in q_ids:
        qv = queries[q]
        qcos = cn @ (qv / np.linalg.norm(qv))
        probe_cells = sorted(range(K_CELLS), key=lambda i: (-qcos[i], i))[:NPROBE]
        mask = np.isin(cell_of, probe_cells)
        cos = (mat @ qv) / (nrm * np.linalg.norm(qv))
        cand = pd.DataFrame(
            {"vec_id": pdf["vec_id"], "cos": cos, "m": mask}
        ).query("m")
        cand = cand.sort_values(["cos", "vec_id"], ascending=[False, True]).head(5)
        expected.extend([(q, int(v)) for v in cand["vec_id"]])
    got = list(zip(out["q_id"].tolist(), out["vec_id"].tolist()))
    assert got == expected
