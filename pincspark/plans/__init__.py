from pincspark.plans.queries import QUERIES  # noqa: F401
