from . import covmat, distance, noise, pallas_gram  # noqa: F401
