from cfgan.serve.client import CFApiError, CFClient  # noqa: F401
from cfgan.serve.engine import CounterfactualEngine  # noqa: F401
