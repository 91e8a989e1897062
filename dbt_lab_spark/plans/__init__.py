from dbt_lab_spark.plans.pipeline import Pipeline, Stage

__all__ = ["Pipeline", "Stage"]
