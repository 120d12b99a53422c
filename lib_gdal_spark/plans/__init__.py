from .pipeline import run_pipeline, PIPELINE_STEPS  # noqa: F401
