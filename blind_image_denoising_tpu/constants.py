"""Framework-wide default constants.

Mirrors the defaults of the reference implementation
(/root/reference/bfcnn/constants.py:7-21) so that configs written for the
reference produce numerically equivalent models here.
"""

DEFAULT_EPSILON = 1e-3
DEFAULT_RELU_BIAS = 0.1
DEFAULT_BN_EPSILON = 1e-3
DEFAULT_LN_EPSILON = 1e-3
DEFAULT_BN_MOMENTUM = 0.995
DEFAULT_MULTIPLIER_L1 = 1.0
DEFAULT_CHANNELWISE_MULTIPLIER_L1 = 0.1

DEFAULT_SOFTORTHOGONAL_L1 = 0.0
DEFAULT_SOFTORTHOGONAL_L2 = 1e-4
DEFAULT_SOFTORTHOGONAL_LAMBDA = 0.01

DEFAULT_SOFTORTHONORMAL_L1 = 0.0
DEFAULT_SOFTORTHONORMAL_L2 = 1e-4
DEFAULT_SOFTORTHONORMAL_LAMBDA = 0.01

# keras.regularizers.L1()/L2() default coefficient — used when a config says
# just "l1" / "l2" with no parameters (reference regularizers.py:115-120).
DEFAULT_KERAS_L1 = 0.01
DEFAULT_KERAS_L2 = 0.01

# --- config key strings (reference constants.py:23-88)
TYPE_STR = "type"
MODEL_STR = "model"
CONFIG_STR = "config"
DATASET_STR = "dataset"
BATCH_SIZE_STR = "batch_size"
INPUT_SHAPE_STR = "input_shape"
INPUT_TENSOR_STR = "input_tensor"

BACKBONE_STR = "backbone"
DENOISER_STR = "denoiser"

MAE_LOSS_STR = "mae_loss"
MSE_LOSS_STR = "mse_loss"
SSIM_LOSS_STR = "ssim_loss"
TOTAL_LOSS_STR = "total_loss"
REGULARIZATION_LOSS_STR = "regularization_loss"

MODEL_LOSS_FN_STR = "model"
DENOISER_LOSS_FN_STR = "denoiser"

USE_BIAS = "use_bias"
KERNEL_INITIALIZER = "kernel_initializer"
KERNEL_REGULARIZER = "kernel_regularizer"

CONFIG_PATH_STR = "config.json"
