from .evaluator import FVDEvaluator, frechet_distance  # noqa: F401
