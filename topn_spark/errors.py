"""Multi-error validation, mirroring the reference's FailureCollector.

The reference accumulates every config problem before failing
(reference TopNConfig.java:62-104 collects into a FailureCollector;
TopN.java:81 throws the batch at run preparation). Users therefore see
all their mistakes at once, not first-error-wins — we reproduce that
surface.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Mapping


@dataclass(frozen=True)
class ValidationFailure:
    message: str
    corrective_action: str | None = None
    property_name: str | None = None

    def __str__(self) -> str:
        parts = [self.message]
        if self.corrective_action:
            parts.append(self.corrective_action)
        if self.property_name:
            parts.append(f"(property: {self.property_name})")
        return " ".join(parts)


class ValidationError(ValueError):
    """Raised with the full list of collected failures."""

    def __init__(self, failures: list[ValidationFailure]):
        self.failures = failures
        super().__init__(
            "; ".join(str(f) for f in failures) or "validation failed"
        )


@dataclass
class FailureCollector:
    failures: list[ValidationFailure] = field(default_factory=list)

    def add_failure(
        self,
        message: str,
        corrective_action: str | None = None,
        property_name: str | None = None,
    ) -> None:
        self.failures.append(
            ValidationFailure(message, corrective_action, property_name)
        )

    def get_or_throw(self) -> None:
        if self.failures:
            raise ValidationError(list(self.failures))


# ---------------------------------------------------------------------------
# Macro-deferred configuration (reference @Macro semantics)
# ---------------------------------------------------------------------------
# The reference marks every config property @Macro (TopNConfig.java:39-54):
# a property may hold an unresolved ``${name}`` placeholder at pipeline
# deploy time, in which case its validation is SKIPPED (the
# ``containsMacro`` guards at TopNConfig.java:64,88,97), and runs again
# against the substituted value at run preparation (TopN.java:74-82
# re-validates and throws the collected batch). These helpers reproduce
# that lifecycle for any engine config object.

#: CDAP macro syntax: ``${name}``; names may not nest further braces.
_MACRO_RE = re.compile(r"\$\{([^${}]*)\}")


def contains_macro(value: object) -> bool:
    """True when a raw config value still holds a ``${...}`` placeholder
    (reference ``PluginConfig.containsMacro``). Non-string values can
    never hold a macro."""
    return isinstance(value, str) and _MACRO_RE.search(value) is not None


def substitute_macros(
    value: object,
    substitutions: Mapping[str, str],
    collector: FailureCollector,
    property_name: str,
) -> object:
    """Replace every ``${name}`` in a raw config value.

    Non-string values pass through. A macro with no entry in
    ``substitutions`` is collected as a failure (the analogue of CDAP's
    macro evaluator rejecting an unresolvable macro at prepareRun) and
    left in place so later type checks don't mask the root cause.
    """
    if not isinstance(value, str):
        return value

    def _sub(m: re.Match[str]) -> str:
        name = m.group(1)
        if name in substitutions:
            return str(substitutions[name])
        collector.add_failure(
            f"Macro '${{{name}}}' has no provided value.",
            "Provide a substitution for the macro at run time.",
            property_name=property_name,
        )
        return m.group(0)

    return _MACRO_RE.sub(_sub, value)
