"""Bloom filter + Bloom-routed dedup: no false negatives ever; the routed
dedup's output is exactly the shuffle dedup's output (false positives are
resolved exactly downstream)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ocr_sam_project_ray.ops.bloom import (
    bloom_contains, bloom_from_dataset, bloom_from_values,
)
from ocr_sam_project_ray.pipelines.extraction import (
    PipelineConfig, run_extraction,
)
from ocr_sam_project_ray.sources.synthetic import ensure_corpus
from ocr_sam_project_ray.stages.dedup import (
    compute_dup_winners, dedup_by_url, dedup_by_url_bloom,
)

SF = "/root/testdata/sf0.001"
M = 1 << 16  # small bitmap → measurable fpr, still tiny


def test_bloom_no_false_negatives_strings():
    members = [f"https://example.com/p{i}" for i in range(5000)]
    bits = bloom_from_values(members, m_bits=M)
    assert bloom_contains(bits, members, m_bits=M).all()


def test_bloom_no_false_negatives_ints():
    members = np.arange(0, 50_000, 7, dtype=np.int64)
    bits = bloom_from_values(members, m_bits=M)
    assert bloom_contains(bits, members, m_bits=M).all()
    # fpr on disjoint probes is small (not zero) at this load factor
    probes = np.arange(1_000_000, 1_050_000, dtype=np.int64)
    fpr = bloom_contains(bits, probes, m_bits=M).mean()
    assert fpr < 0.05


def test_bloom_distributed_build_equals_local():
    vals = [f"url-{i}" for i in range(2000)]
    local = bloom_from_values(vals, m_bits=M)
    ds = ray.data.from_arrow(
        pa.table({"url": pa.array(vals, pa.string())})
    ).repartition(5)
    dist = bloom_from_dataset(ds, "url", m_bits=M)
    assert (local == dist).all()


def test_dup_winners_is_arrow_table():
    paths = ensure_corpus(SF)
    w = compute_dup_winners(paths["pages"])
    assert isinstance(w, pa.Table)
    assert w.column_names == ["url", "max_ts"]
    assert w.num_rows > 0  # the corpus has url duplicates by construction


def test_dedup_by_url_bloom_equals_shuffle():
    paths = ensure_corpus(SF)
    ds = ray.data.read_parquet(paths["pages"], columns=["url", "warc_ts"])
    expected = (
        dedup_by_url(ds, num_partitions=4)
        .to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    got = (
        dedup_by_url_bloom(ds, paths["pages"], num_partitions=4, m_bits=M)
        .to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, expected)


@pytest.mark.parametrize("mode", ["bloom"])
def test_pipeline_bloom_mode_equals_broadcast(mode):
    base = (
        run_extraction(SF, PipelineConfig(dedup_partitions=2))
        .select_columns(["doc_id", "extracted_text", "success"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        run_extraction(SF, PipelineConfig(dedup_partitions=2, dedup_mode=mode))
        .select_columns(["doc_id", "extracted_text", "success"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, base)
