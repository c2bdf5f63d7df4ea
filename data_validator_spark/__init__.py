"""data_validator_spark — a PySpark-native data validation + analytics engine.

Re-expresses the capabilities of target/data-validator (reference:
/root/reference, Scala) Spark-first: every check is a native Column
expression fused into a single aggregation scan per table, costly
checks are standalone jobs, and reports/config/vars mirror the
reference YAML surface. Beyond the reference, adds large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) and Structured Streaming validation.
"""

from data_validator_spark.config import ValidatorConfig, load_config, parse_config
from data_validator_spark.runner import ValidatorTableRunner, run_config
from data_validator_spark.substitution import VarSubstitution

__version__ = "0.1.0"

__all__ = [
    "ValidatorConfig",
    "VarSubstitution",
    "ValidatorTableRunner",
    "load_config",
    "parse_config",
    "run_config",
]
