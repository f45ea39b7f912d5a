from cfgan.ops.epilogue import cf_epilogue, epilogue_terms  # noqa: F401
