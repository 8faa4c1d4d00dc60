"""Sixth bank of CLI tools: nnet3 model configuration (xconfig).

Canonical shapes mirrored: egs/wsj/s5/steps/nnet3/xconfig_to_configs.py
(the script every nnet3/chain recipe calls to expand its model
definition) — here the expansion target is the flax interpreter in
am/xconfig.py rather than nnet3 config-file text, so the tool's job is
validation + the per-layer dimension report the reference script
prints, plus writing the parsed form where the recipe expects it.
"""

from __future__ import annotations

import os
import sys

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions

log = get_logger(__name__)


@tool("xconfig-to-configs")
def xconfig_to_configs_tool(argv):
    """Validate an xconfig file and report per-layer output dims.

    Usage: xconfig-to-configs --xconfig-file=<f> --config-dir=<dir>
    Writes <dir>/final.xconfig (the canonical copy recipes load) and
    <dir>/network.txt (layer table); prints the table to stderr."""
    po = ParseOptions(
        "xconfig-to-configs --xconfig-file=<file> --config-dir=<dir>")
    po.register("xconfig-file", str, "", "input xconfig file")
    po.register("config-dir", str, "", "output directory")
    po.register("frame-subsampling-factor", int, 1,
                "time subsampling before output layers (chain ×3)")
    po.read(argv)
    if not po["xconfig-file"] or not po["config-dir"]:
        po.print_usage()
        return 1
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.am.xconfig import model_from_xconfig

    with open(po["xconfig-file"]) as f:
        text = f.read()
    model, in_dim, out_dims = model_from_xconfig(
        text, frame_subsampling_factor=po["frame-subsampling-factor"])

    # init once (validates the network builds + counts parameters);
    # per-layer output dims are statically known from each layer's
    # options, so the table needs no re-tracing
    x = jnp.zeros((1, 21, in_dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    dims = {}
    for line in model.lines:
        lt, name = line.layer_type, line.name
        if lt == "input":
            dims[name] = in_dim
        elif lt in ("relu-batchnorm-layer", "relu-renorm-layer",
                    "tdnnf-layer", "attention-relu-batchnorm-layer",
                    "output-layer"):
            dims[name] = line.opt_int("dim")
        elif lt == "conv-relu-batchnorm-layer":
            h_in = line.opt_int("height-in")
            sub = line.opt_int("height-subsample-out", 1)
            dims[name] = ((h_in - 1) // sub + 1) * \
                line.opt_int("num-filters-out")
        elif lt == "fast-lstmp-layer":
            dims[name] = line.opt_int(
                "recurrent-projection-dim",
                max(line.opt_int("cell-dim") // 2, 1))
        elif lt == "stats-layer":
            cfg = line.opt("config", "mean+stddev(-99:3:9:99)")
            prev = [n for n in dims][-1]
            dims[name] = dims[prev] * (2 if "stddev" in cfg else 1)
        else:
            prev = [n for n in dims][-1]
            dims[name] = dims[prev]

    os.makedirs(po["config-dir"], exist_ok=True)
    with open(os.path.join(po["config-dir"], "final.xconfig"), "w") as f:
        f.write(text)
    rows = ["# name type dim"]
    for line in model.lines:
        rows.append(f"{line.name} {line.layer_type} {dims[line.name]}")
    with open(os.path.join(po["config-dir"], "network.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")
    num_params = sum(
        int(v.size) for v in jax.tree_util.tree_leaves(variables))
    for r in rows:
        log.info("%s", r)
    log.info("xconfig-to-configs: %d layers, %d parameters, outputs %s",
             len(model.lines), num_params, out_dims)
    return 0
