"""Multi-error validation, mirroring the reference's FailureCollector.

The reference accumulates every config problem before failing
(reference TopNConfig.java:62-104 collects into a FailureCollector;
TopN.java:81 throws the batch at run preparation). Users therefore see
all their mistakes at once, not first-error-wins — we reproduce that
surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field


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
