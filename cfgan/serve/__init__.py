from cfgan.serve.engine import CounterfactualEngine  # noqa: F401
