"""Import the reference torch model zoo with cv_lib stubbed out.

The reference's ``models/__init__.py`` imports cv_lib (an external repo not
vendored here); we inject a minimal stub so the torch ViT/DeiT classes can be
instantiated as parity oracles for the Flax port. Used by tests only.
"""

import sys
import types


def import_reference_models():
    if "cv_lib" not in sys.modules:
        cv_lib = types.ModuleType("cv_lib")
        classification = types.ModuleType("cv_lib.classification")
        cls_models = types.ModuleType("cv_lib.classification.models")
        cls_models.get_model = lambda *a, **k: None
        cls_models.register_models = lambda *a, **k: None
        classification.models = cls_models
        cv_lib.classification = classification
        sys.modules["cv_lib"] = cv_lib
        sys.modules["cv_lib.classification"] = classification
        sys.modules["cv_lib.classification.models"] = cls_models
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models as ref_models  # noqa: F401

    return ref_models
