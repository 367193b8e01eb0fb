from .santa_lucia import ThermoParams, build_tables, update_dp_param  # noqa: F401
