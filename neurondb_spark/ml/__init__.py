"""ML surface (SURVEY §2.8): unified train/predict/evaluate API over MLlib
with the reference's model-catalog contract, plus closed-form/statistical
operators (z-score outliers, drift, clustering quality) as exact DataFrame
expressions."""

from neurondb_spark.ml.api import MLEngine, list_algorithms  # noqa: F401
