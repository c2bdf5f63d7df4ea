"""Validator event log.

Parity: reference EventLog.scala / ValidatorEvent hierarchy
(src/main/scala/com/target/data_validator/EventLog.scala). Events
accumulate per check and drive the JSON/HTML reports.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ValidatorEvent:
    failed: bool = False

    def to_dict(self) -> dict[str, Any]:
        return {"type": self.__class__.__name__, "failed": self.failed}


@dataclass
class ValidatorError(ValidatorEvent):
    message: str = ""

    def __init__(self, message: str):
        super().__init__(failed=True)
        self.message = message

    def to_dict(self) -> dict[str, Any]:
        # JSON tag/field parity: JsonEncoders.scala eventEncoder ("error"/msg)
        return {"type": "error", "failed": True, "msg": self.message}


@dataclass
class ValidatorGood(ValidatorEvent):
    message: str = ""

    def __init__(self, message: str):
        super().__init__(failed=False)
        self.message = message

    def to_dict(self) -> dict[str, Any]:
        return {"type": "good", "msg": self.message}


@dataclass
class ValidatorCounter(ValidatorEvent):
    name: str = ""
    value: int = 0

    def __init__(self, name: str, value: int):
        super().__init__(failed=False)
        self.name = name
        self.value = value

    def to_dict(self) -> dict[str, Any]:
        return {"type": "counter", "name": self.name, "value": self.value}


@dataclass
class ValidatorCheckEvent(ValidatorEvent):
    label: str = ""
    count: int = 0
    error_count: int = 0

    def __init__(self, failed: bool, label: str, count: int, error_count: int):
        super().__init__(failed=failed)
        self.label = label
        self.count = count
        self.error_count = error_count

    def to_dict(self) -> dict[str, Any]:
        return {
            "type": "checkEvent",
            "failed": self.failed,
            "label": self.label,
            "count": self.count,
            "errorCount": self.error_count,
        }


@dataclass
class ColumnBasedCheckEvent(ValidatorEvent):
    data: dict[str, str] = field(default_factory=dict)
    message: str = ""

    def __init__(self, failed: bool, data: dict[str, str], message: str):
        super().__init__(failed=failed)
        self.data = data
        self.message = message

    def to_dict(self) -> dict[str, Any]:
        return {
            "type": "columnBasedCheckEvent",
            "failed": self.failed,
            "data": self.data,
            "message": self.message,
        }


@dataclass
class QuickCheckError(ValidatorEvent):
    """One sampled failing row (detailed-errors pass).

    Parity: ValidatorQuickCheckError in EventLog.scala — key columns
    identify the row, `value` is the offending column value.
    """

    key: dict[str, Any] = field(default_factory=dict)
    value: Any = None
    message: str = ""

    def __init__(self, key: dict[str, Any], value: Any, message: str):
        super().__init__(failed=True)
        self.key = key
        self.value = value
        self.message = message

    def to_dict(self) -> dict[str, Any]:
        # Raw typed values (reference ValidatorQuickCheckError emits the
        # value as-is in JSON); json.dump(default=str) handles dates etc.
        return {
            "type": "quickCheckError",
            "failed": True,
            "message": self.message,
            "key": dict(self.key),
            # additive beyond the reference: the offending value itself
            "value": self.value,
        }


class ValidatorTimer(ValidatorEvent):
    """Wall-clock timer event. Parity: ValidatorTimer in EventLog.scala."""

    def __init__(self, label: str):
        super().__init__(failed=False)
        self.label = label
        self.duration_ns: int = 0

    def __enter__(self) -> "ValidatorTimer":
        self._t0 = time.monotonic_ns()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.duration_ns = time.monotonic_ns() - self._t0

    def to_dict(self) -> dict[str, Any]:
        # reference timers emit nanoseconds ("ns")
        return {"type": "timer", "label": self.label, "ns": self.duration_ns}
