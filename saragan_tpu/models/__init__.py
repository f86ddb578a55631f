from saragan_tpu.models.registry import get_architecture, register  # noqa: F401
