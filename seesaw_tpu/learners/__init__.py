"""Per-round feedback learners (P4): linear probes fit on labeled vectors."""

from .logistic_regression import LogisticRegression, RankRegression  # noqa: F401
