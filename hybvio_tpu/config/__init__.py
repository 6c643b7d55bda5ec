from .params_generated import Parameters, ParametersOdometry, ParametersTracker, ParametersSlam, parameter_names  # noqa: F401
from .loader import load_parameters, set_key_value, apply_parameters_text, apply_yaml, apply_calibration_json, apply_argv  # noqa: F401
from .derived import DerivedParameters  # noqa: F401
