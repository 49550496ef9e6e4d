"""YAML config tier: dataclass <-> YAML round-tripping.

Re-derivation of the reference's config system (reference: common/yaml/
yaml_io.h LoadYamlFile/SaveYamlFile with Serialize(Archive*) visitors;
MultibodyPlantConfig multibody_plant_config.h; SimulatorConfig;
whole-scenario YAML examples/hardware_sim/scenario.h:32,95).  In Python the
visitor pattern collapses to dataclass introspection: any (possibly nested)
dataclass round-trips through YAML, with numpy arrays and tuples handled.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Type, TypeVar, get_args, get_origin

import numpy as np
import yaml

_T = TypeVar("_T")


def _to_plain(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            f.name: _to_plain(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if hasattr(obj, "tolist") and not isinstance(obj, (str, bytes)):
        # jax arrays and numpy scalars
        try:
            return obj.tolist()
        except Exception:
            pass
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    return obj


def _from_plain(cls, value):
    if dataclasses.is_dataclass(cls) and isinstance(value, dict):
        import typing

        kwargs = {}
        try:
            hints = typing.get_type_hints(cls)
        except Exception:
            hints = {f.name: f.type for f in dataclasses.fields(cls)}
        for f in dataclasses.fields(cls):
            if f.name in value:
                kwargs[f.name] = _from_plain_typed(
                    hints.get(f.name, f.type), value[f.name]
                )
        return cls(**kwargs)
    return value


def _from_plain_typed(tp, value):
    # Unresolvable string annotations: pass through untouched.
    if isinstance(tp, str):
        return value
    origin = get_origin(tp)
    if dataclasses.is_dataclass(tp) and isinstance(value, dict):
        return _from_plain(tp, value)
    if origin in (tuple,):
        args = get_args(tp)
        if args and args[-1] is Ellipsis:
            return tuple(_from_plain_typed(args[0], v) for v in value)
        if args:
            return tuple(
                _from_plain_typed(a, v) for a, v in zip(args, value)
            )
        return tuple(value)
    if origin in (list,):
        (arg,) = get_args(tp) or (Any,)
        return [_from_plain_typed(arg, v) for v in value]
    return _maybe_tuple(value) if origin is None and tp is tuple else value


def _maybe_tuple(value):
    return tuple(value) if isinstance(value, list) else value


def save_yaml(obj, path: Optional[str] = None) -> str:
    """Serialize a dataclass to YAML (SaveYamlFile role).  Returns the text."""
    text = yaml.safe_dump(_to_plain(obj), sort_keys=False)
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text


def load_yaml(cls: Type[_T], source: str) -> _T:
    """Load a dataclass from a YAML file path or YAML text (LoadYamlFile)."""
    if "\n" in source or ":" in source and not source.endswith((".yaml", ".yml")):
        try:
            import os

            if os.path.exists(source):
                with open(source) as f:
                    source = f.read()
        except OSError:
            pass
    else:
        with open(source) as f:
            source = f.read()
    data = yaml.safe_load(source)
    return _from_plain(cls, data)


# ---------------------------------------------------------------------------
# Standard config structs (the MultibodyPlantConfig / SimulatorConfig tier).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PlantConfig:
    """Mirror of MultibodyPlantConfig (multibody_plant_config.h)."""

    time_step: float = 1e-3
    contact_model: str = "point"  # {point} (hydroelastic: future work)
    discrete_contact_approximation: str = "sap"
    stiction_tolerance: float = 1e-4
    penetration_allowance: float = 1e-3


@dataclasses.dataclass
class SimulatorYamlConfig:
    """Mirror of SimulatorConfig (simulator_config.h)."""

    integration_scheme: str = "rk4"
    max_step_size: float = 1e-3
    accuracy: float = 1e-4
    use_error_control: bool = False
    target_realtime_rate: float = 0.0


@dataclasses.dataclass
class MpmYamlConfig:
    """Mirror of MpmConfigParams (gpu_mpm/cpu_mpm_model.h:17-26)."""

    substep_dt: float = 1e-4
    contact_stiffness: float = 1e5
    contact_damping: float = 10.0
    contact_friction_mu: float = 1.0
    contact_query_frequency: int = 1
    mpm_bc: int = -1


@dataclasses.dataclass
class Scenario:
    """Whole-scenario YAML (examples/hardware_sim/scenario.h:32 role)."""

    simulation_duration: float = 1.0
    random_seed: int = 0
    plant: PlantConfig = dataclasses.field(default_factory=PlantConfig)
    simulator: SimulatorYamlConfig = dataclasses.field(
        default_factory=SimulatorYamlConfig
    )
    model_files: list = dataclasses.field(default_factory=list)


def load_scenario(source: str) -> Scenario:
    """LoadScenario (scenario.h:95 role)."""
    return load_yaml(Scenario, source)


def save_scenario(scenario: Scenario, path: Optional[str] = None) -> str:
    return save_yaml(scenario, path)
