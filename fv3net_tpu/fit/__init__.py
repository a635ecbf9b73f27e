from ._shared import (
    ArrayPacker,
    Predictor,
    StandardScaler,
    dump,
    load,
    register,
    TRAINING_FUNCTIONS,
    register_training_function,
    get_training_function,
    TrainingConfig,
)
from .models import (
    ConstantOutputPredictor,
    DerivedModel,
    EnsembleModel,
    CombinedOutputModel,
    OutOfSampleModel,
    TaperedModel,
)
from .dense import train_dense_model, DenseHyperparameters
from .sklearn_models import (
    train_random_forest,
    RandomForestHyperparameters,
    MinMaxNoveltyDetector,
    train_min_max_novelty_detector,
)

__all__ = [
    "ArrayPacker",
    "Predictor",
    "StandardScaler",
    "dump",
    "load",
    "register",
    "TRAINING_FUNCTIONS",
    "register_training_function",
    "get_training_function",
    "TrainingConfig",
    "ConstantOutputPredictor",
    "DerivedModel",
    "EnsembleModel",
    "CombinedOutputModel",
    "OutOfSampleModel",
    "TaperedModel",
    "train_dense_model",
    "DenseHyperparameters",
    "train_random_forest",
    "RandomForestHyperparameters",
    "MinMaxNoveltyDetector",
    "train_min_max_novelty_detector",
]
