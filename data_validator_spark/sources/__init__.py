"""Table sources.

Parity: reference ValidatorTable.scala subclasses — HiveTable,
OrcFile, ParquetFile, and the generic `format`+`options`+`loadData`
DataFrameReader fluent loader (ValidatorSpecifiedFormatLoader). The
`condition` is applied as a WHERE immediately at load so Catalyst
pushes predicates into the scan, and checks only reference needed
columns so column pruning reaches the reader.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


class TableSource(ABC):
    """A named, loadable table plus its checks metadata."""

    def __init__(
        self,
        key_columns: Optional[Sequence[str]] = None,
        condition: Optional[str] = None,
    ):
        self.key_columns = list(key_columns) if key_columns else None
        self.condition = condition

    @abstractmethod
    def load_df(self, spark: SparkSession) -> DataFrame: ...

    @property
    @abstractmethod
    def label(self) -> str: ...

    def open(self, spark: SparkSession) -> DataFrame:
        """Load and apply `condition` — predicate reaches the scan
        (reference ValidatorTable.open)."""
        df = self.load_df(spark)
        if self.condition:
            df = df.where(self.condition)
        return df

    def json_identity(self) -> dict[str, Any]:
        """Source-specific report keys (reference JsonEncoders
        tableEncoder: parquetFile/orcFile/db+table/format/dfLabel)."""
        return {"dfLabel": self.label}


class ParquetFile(TableSource):
    def __init__(self, path: str, **kw: Any):
        super().__init__(**kw)
        self.path = path

    def load_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    @property
    def label(self) -> str:
        return f"ParquetFile:{self.path}"

    def json_identity(self) -> dict[str, Any]:
        return {"parquetFile": self.path}


class OrcFile(TableSource):
    def __init__(self, path: str, **kw: Any):
        super().__init__(**kw)
        self.path = path

    def load_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.orc(self.path)

    @property
    def label(self) -> str:
        return f"OrcFile:{self.path}"

    def json_identity(self) -> dict[str, Any]:
        return {"orcFile": self.path}


class HiveTable(TableSource):
    """`db.table` via the session catalog (Hive metastore when the
    session has hive support; works against any registered catalog
    table in tests)."""

    def __init__(self, db: str, table: str, **kw: Any):
        super().__init__(**kw)
        self.db = db
        self.table = table

    def load_df(self, spark: SparkSession) -> DataFrame:
        return spark.table(f"{self.db}.{self.table}" if self.db else self.table)

    @property
    def label(self) -> str:
        return f"HiveTable:{self.db}.{self.table}"

    def json_identity(self) -> dict[str, Any]:
        return {"db": self.db, "table": self.table}


class SpecifiedFormatLoader(TableSource):
    """Generic spark.read.format(fmt).options(...).load(paths…).

    Parity: reference ValidatorSpecifiedFormatLoader — covers csv,
    json, text, jdbc, or any third-party DataSource on the classpath.
    """

    def __init__(
        self,
        format: str,
        options: Optional[dict[str, Any]] = None,
        load_data: Optional[Sequence[str]] = None,
        **kw: Any,
    ):
        super().__init__(**kw)
        self.format = format
        self.options = dict(options or {})
        self.load_data = list(load_data or [])

    def load_df(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format(self.format)
        if self.options:
            reader = reader.options(**{k: str(v) for k, v in self.options.items()})
        return reader.load(*self.load_data) if self.load_data else reader.load()

    @property
    def label(self) -> str:
        return f"SpecifiedFormatLoader:{self.format}:{','.join(self.load_data)}"

    def json_identity(self) -> dict[str, Any]:
        return {"format": self.format, "options": self.options, "loadData": self.load_data}


class TableFormatSource(TableSource):
    """Lakehouse table formats (Delta Lake / Apache Iceberg) via their
    DataSource V2 names. The connector jars are NOT bundled — load_df
    degrades to a clear actionable error instead of Spark's opaque
    ClassNotFoundException, and config parsing/validation still works
    without them (so one config file can mix parquet and delta tables
    and fail only when the missing format is actually read)."""

    FORMATS = {"delta": "delta-spark", "iceberg": "iceberg-spark-runtime"}

    def __init__(self, fmt: str, path: str, **kw: Any):
        super().__init__(**kw)
        self.fmt = fmt
        self.path = path

    def load_df(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.format(self.fmt).load(self.path)
        except Exception as ex:  # connector missing or table unreadable
            raise IOError(
                f"cannot read {self.fmt} table at {self.path}: {ex}. "
                f"Is the {self.FORMATS[self.fmt]} connector on the Spark classpath?"
            ) from ex

    @property
    def label(self) -> str:
        return f"TableFormatSource:{self.fmt}:{self.path}"

    def json_identity(self) -> dict[str, Any]:
        return {f"{self.fmt}Table": self.path}


def source_from_dict(d: dict[str, Any]) -> TableSource:
    """Build a source from one `tables:` YAML entry.

    Dispatch parity: reference ConfigParser.configureTables, plus
    lakehouse keys (deltaTable/icebergTable) beyond the reference.
    """
    common = {"key_columns": d.get("keyColumns"), "condition": d.get("condition")}
    if "parquetFile" in d:
        return ParquetFile(d["parquetFile"], **common)
    if "orcFile" in d:
        return OrcFile(d["orcFile"], **common)
    if "deltaTable" in d:
        return TableFormatSource("delta", d["deltaTable"], **common)
    if "icebergTable" in d:
        return TableFormatSource("iceberg", d["icebergTable"], **common)
    if "table" in d:
        return HiveTable(d.get("db", ""), d["table"], **common)
    if "format" in d:
        return SpecifiedFormatLoader(
            d["format"], d.get("options"), d.get("loadData"), **common
        )
    raise ValueError(f"Unknown table source in config entry: {sorted(d)}")
