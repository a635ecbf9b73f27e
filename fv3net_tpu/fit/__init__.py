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
from .convolutional import (
    train_convolutional_model,
    ConvolutionalHyperparameters,
    ConvolutionalModel,
    append_halos,
)
from .precipitative import (
    train_precipitative_model,
    PrecipitativeHyperparameters,
    PrecipitativeModel,
)
from .reservoir import (
    train_reservoir_model,
    ReservoirHyperparameters,
    ReservoirComputingModel,
    Reservoir,
    RankDivider,
)
from .generative import (
    train_autoencoder,
    AutoencoderHyperparameters,
    AutoencoderModel,
    train_cyclegan,
    CycleGANHyperparameters,
    CycleGANModel,
)
from .sklearn_models import (
    train_random_forest,
    RandomForestHyperparameters,
    MinMaxNoveltyDetector,
    train_min_max_novelty_detector,
)
from .graph import (
    train_graph_model,
    GraphHyperparameters,
    GraphModel,
)
from .recurrent import (
    train_fmr_model,
    FMRHyperparameters,
    FMRModel,
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
    "train_convolutional_model",
    "ConvolutionalHyperparameters",
    "ConvolutionalModel",
    "append_halos",
    "train_precipitative_model",
    "PrecipitativeHyperparameters",
    "PrecipitativeModel",
    "train_reservoir_model",
    "ReservoirHyperparameters",
    "ReservoirComputingModel",
    "Reservoir",
    "RankDivider",
    "train_autoencoder",
    "AutoencoderHyperparameters",
    "AutoencoderModel",
    "train_cyclegan",
    "CycleGANHyperparameters",
    "CycleGANModel",
    "train_random_forest",
    "RandomForestHyperparameters",
    "MinMaxNoveltyDetector",
    "train_min_max_novelty_detector",
]
