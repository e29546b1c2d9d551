"""Auxiliary sources — SURVEY.md §2.1 S4/S6.

- ``read_model_metadata_yaml``: per-model YAML metadata files -> the
  metadata dimension DataFrame. Reference: yaml.safe_load per file over a
  sorted directory listing (/root/reference/utils/jsonld.py:120-123,
  /root/reference/pipeline/create_jsonld_v6_0_0.py:61-73). Two paths:
  driver-side parse for config-sized dims (the normal case), and a
  distributed wholeTextFiles + mapInPandas path for metadata corpora too
  large for the driver.
- ``read_alias_csv``: CSV dimension (the geodata.csv analog,
  /root/reference/pipeline/jsonld_to_html.py:40-53) -> broadcastable alias
  dimension.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from smh_to_jsonld_spark.sources.synth import METADATA_SCHEMA

try:
    import yaml
except ImportError:  # pragma: no cover - yaml is present in this env
    yaml = None


def _meta_row(round_id: str, model_name: str, data: dict) -> tuple:
    contribs = [
        (c.get("name"), c.get("affiliation"), c.get("email"))
        for c in (data.get("model_contributors") or [])
    ]
    return (
        round_id,
        model_name,
        data.get("team_abbr"),
        data.get("model_abbr"),
        data.get("team_name"),
        data.get("model_version"),
        data.get("license"),
        data.get("website_url"),
        data.get("methods"),
        data.get("methods_long"),
        data.get("data_inputs"),
        data.get("team_funding"),
        contribs,
    )


def read_model_metadata_yaml(
    spark: SparkSession, metadata_dir: str, round_id: str, distributed: bool = False
) -> DataFrame:
    """YAML metadata dir -> metadata dimension (sorted file order, S4/O1)."""
    if yaml is None:
        raise ImportError("pyyaml not available")
    if not distributed:
        rows = []
        for name in sorted(os.listdir(metadata_dir)):
            if not name.endswith((".yaml", ".yml")):
                continue
            with open(Path(metadata_dir) / name) as f:
                data = yaml.safe_load(f)
            rows.append(_meta_row(round_id, Path(name).stem, data))
        return spark.createDataFrame(rows, schema=METADATA_SCHEMA)

    # scale path: parse on executors (metadata corpus >> driver memory)
    rdd = spark.sparkContext.wholeTextFiles(os.path.join(metadata_dir, "*.y*ml"))

    def parse(kv):
        path, content = kv
        stem = Path(path).stem
        return _meta_row(round_id, stem, yaml.safe_load(content))

    return spark.createDataFrame(rdd.map(parse), schema=METADATA_SCHEMA)


def read_alias_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV alias dimension: (alias, canonical, entity_type) with header."""
    return spark.read.csv(path, header=True, inferSchema=False)
