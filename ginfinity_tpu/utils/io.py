"""I/O, logging, and input validation utilities.

Reproduces the reference's run-log conventions (utils.py:33-138,543-584):
an append-style ``key: value`` block log written next to every pipeline
output, with a run header of timestamp + argv + system info.
"""

from __future__ import annotations

import os
import platform
import sys
from datetime import datetime


def get_system_info() -> dict:
    info = {
        "Operating System": f"{platform.system()} {platform.release()}",
        "Platform": platform.platform(),
        "Python Version": platform.python_version(),
    }
    try:
        import jax

        info["JAX Version"] = jax.__version__
        # jax.devices() BLOCKS on backend bring-up (20-35 s over a
        # remote-TPU tunnel) — calling it here would serialize away the
        # start_backend_warmup()/input-parse overlap every pipeline
        # relies on.  Only report devices if a backend already exists.
        try:
            from jax._src import xla_bridge

            initialized = bool(getattr(xla_bridge, "_backends", None))
        except Exception:
            initialized = False
        if initialized:
            info["Devices"] = ", ".join(str(d) for d in jax.devices())
            info["Default Backend"] = jax.default_backend()
        else:
            info["Devices"] = (
                "(backend bring-up in progress; see pipeline output)"
            )
    except Exception:  # pragma: no cover
        info["JAX"] = "unavailable"
    try:
        import psutil

        info["CPU Cores"] = psutil.cpu_count(logical=True)
        info["Memory"] = f"{psutil.virtual_memory().total / 1024 ** 3:.2f} GB"
    except Exception:
        pass
    return info


def log_information(log_path, info_dict, log_name=None, open_type="a", print_log=False):
    """Append a key:value block to the run log (utils.py:103-138)."""
    if log_path is None:
        return
    with open(log_path, open_type) as f:
        sep = "\n" + "=" * 50 + "\n"
        f.write(sep)
        if print_log:
            print(sep)
        if log_name:
            f.write(f"{log_name}\n")
            if print_log:
                print(log_name)
        for key, value in info_dict.items():
            line = f"{key}: {value}\n"
            f.write(line)
            if print_log:
                print(line, end="")


def log_setup(log_path, print_log=True):
    log_information(
        log_path,
        {"Date and Time": str(datetime.now()), "Command Run": " ".join(sys.argv)},
        "Run Info",
        "w",
    )
    log_information(log_path, get_system_info(), "System Info", print_log=print_log)


def read_table(path: str):
    """Read a CSV/TSV into pandas with the reference's separator heuristic."""
    import pandas as pd

    sep = "\t" if path.endswith(".tsv") else ","
    return pd.read_csv(path, sep=sep, low_memory=False)


def setup_and_read_input(args, need_model: bool = False):
    """Shared pipeline input handling (utils.py:543-584): log setup, read
    input table, validate id/structure columns, resolve keep-cols."""
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    log_path = os.path.splitext(args.output)[0] + ".log"
    quiet = getattr(args, "quiet", False)
    log_setup(log_path, print_log=not quiet)
    log_information(log_path, vars(args), "Arguments", print_log=not quiet)

    df = read_table(args.input)

    if args.structure_column_name not in df.columns:
        raise ValueError(
            f"Structure column '{args.structure_column_name}' not found in input data."
        )
    if args.id_column not in df.columns:
        raise ValueError(f"ID column '{args.id_column}' not found in input data.")
    if df[args.id_column].duplicated().any():
        log_information(log_path, {"warning": "duplicate IDs"}, "Warning")

    if need_model:
        if not hasattr(args, "model_path"):
            raise ValueError("need_model=True but args has no model_path attribute.")
        if not os.path.exists(args.model_path):
            raise ValueError(f"Model path '{args.model_path}' does not exist.")

    if getattr(args, "keep_cols", None):
        requested = [c.strip() for c in args.keep_cols.split(",")]
        missing = [c for c in requested if c not in df.columns]
        if missing:
            raise ValueError(
                f"The following columns specified in --keep-cols do not exist in the input file: {missing}"
            )
        propagate = requested
    else:
        propagate = [
            c for c in df.columns if c not in (args.id_column, args.structure_column_name)
        ]
    return df, log_path, propagate
