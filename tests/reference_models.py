"""Import the reference torch model zoo with cv_lib stubbed out.

The reference's ``models/__init__.py`` imports cv_lib (an external repo not
vendored here); we inject a minimal stub so the torch ViT/DeiT classes can be
instantiated as parity oracles for the Flax port. Used by tests only.
"""

import sys
import types


def import_reference_models():
    if "cv_lib" not in sys.modules:
        import json

        def _mod(name):
            m = types.ModuleType(name)
            m.__path__ = []  # mark as package so submodule imports resolve
            sys.modules[name] = m
            return m

        cv_lib = _mod("cv_lib")
        classification = _mod("cv_lib.classification")
        cls_models = _mod("cv_lib.classification.models")
        cls_models.get_model = lambda *a, **k: None
        cls_models.register_models = lambda *a, **k: None
        classification.models = cls_models
        cv_lib.classification = classification

        utils = _mod("cv_lib.utils")
        utils.to_json_str = lambda obj, indent=4: json.dumps(obj, default=str, indent=indent)
        utils.get_cfg = lambda fp: {}
        utils.tensor_dict_items = lambda d, ndigits=4: d
        utils.count_parameters = lambda *a, **k: 0
        cv_lib.utils = utils

        dist = _mod("cv_lib.distributed")
        dist_utils = _mod("cv_lib.distributed.utils")
        dist_utils.get_rank = lambda: 0
        dist_utils.is_main_process = lambda: True
        dist_utils.barrier = lambda: None
        dist.utils = dist_utils
        cv_lib.distributed = dist

        metrics = _mod("cv_lib.metrics")
        cv_lib.metrics = metrics
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models as ref_models  # noqa: F401

    return ref_models
