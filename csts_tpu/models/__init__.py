from csts_tpu.models.build import MODEL_REGISTRY, build_model  # noqa: F401

# importing the model modules populates the registry
from csts_tpu.models import csts  # noqa: F401
from csts_tpu.models import mvit_classifier  # noqa: F401
