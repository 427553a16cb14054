"""Logical plans: the end-to-end KG pipeline, manifests/resume, metrics."""
