"""Model registry (reference moge/model/__init__.py:9)."""

from typing import Type


def import_model_class_by_version(version: str) -> Type:
    assert version in ["v1", "v2"], f"Unsupported model version: {version}"
    if version == "v1":
        from .v1 import MoGeModel
    else:
        from .v2 import MoGeModel
    return MoGeModel
