from tokenreduction_tpu.models.registry import create_model, list_models  # noqa: F401
