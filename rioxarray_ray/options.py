"""Global engine options (the set_options analogue,
/root/reference/rioxarray/_options.py:56-131).

Same contract as the reference: ``get_option(name)`` reads, ``set_options``
is both a permanent setter and a context manager that restores the previous
values on exit.  Options are read at STAGE-BUILD time (driver side) — they
parameterize the Ray Data plan, so changing them mid-stream does not
retroactively alter executing stages (documented deviation: the reference
reads them lazily per call, which has the same user-visible effect for
plan-at-a-time usage).
"""

from __future__ import annotations

from typing import Any

EXPORT_GRID_MAPPING = "export_grid_mapping"
SKIP_MISSING_SPATIAL_DIMS = "skip_missing_spatial_dims"
CONVENTION = "convention"

OPTIONS: dict[str, Any] = {
    EXPORT_GRID_MAPPING: True,
    SKIP_MISSING_SPATIAL_DIMS: False,
    CONVENTION: None,  # None -> CF (stages/convention.py default)
}

_VALIDATORS = {
    EXPORT_GRID_MAPPING: lambda v: isinstance(v, bool),
    SKIP_MISSING_SPATIAL_DIMS: lambda v: isinstance(v, bool),
    CONVENTION: lambda v: v is None or v in ("cf", "zarr"),
}


def get_option(key: str) -> Any:
    """Read a global option value."""
    return OPTIONS[key]


class set_options:
    """Set global options, permanently or scoped::

        rioxarray_ray.set_options(export_grid_mapping=False)      # permanent
        with rioxarray_ray.set_options(convention="zarr"):        # scoped
            ...
    """

    def __init__(self, **kwargs: Any):
        self._old = {}
        for key, value in kwargs.items():
            if key not in OPTIONS:
                raise ValueError(
                    f"unknown option {key!r}; valid options: {sorted(OPTIONS)}"
                )
            validator = _VALIDATORS.get(key)
            if validator is not None and not validator(value):
                raise ValueError(f"invalid value for option {key!r}: {value!r}")
            self._old[key] = OPTIONS[key]
            OPTIONS[key] = value

    def __enter__(self) -> "set_options":
        return self

    def __exit__(self, *exc) -> None:
        OPTIONS.update(self._old)
