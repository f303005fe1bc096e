"""TFLite graphs compiled to jitted JAX functions.

The reference's landmark stack runs mediapipe FaceLandmarker — a graph of
.tflite models (face detector, 478-pt landmarks, blendshapes) driven by
3.3k lines of task-graph python
(/root/reference/MOFA-Video-Hybrid/aniportrait/src/utils/face_landmark.py,
mp_utils.py:19-37). Rather than transcribing those architectures by hand,
this module compiles the .tflite graphs themselves to pure JAX: flatbuffer
-> op list -> one jittable `fn(params, *inputs)` whose weights are a
param tree (jit ARGUMENTS, so they can be donated/sharded/bf16-cast like
any other mofa_tpu model — never baked constants).

Scope: the fp32/fp16 op vocabulary of the mediapipe face models (conv /
dwconv / prelu / pools / elementwise / reductions / slicing). Quantized
(int8) graphs are out of scope. Parsing needs tensorflow's bundled
flatbuffer schema (available in this image); a parsed graph can be saved
to .npz and re-loaded with zero TF dependency (`save_npz` / `load_npz`),
so deployment needs only JAX.

Golden tests (tests/test_tflite_jax.py) run the reference's own model
files (mp_models/*.task|.tflite) through this compiler and require
~1e-4 agreement with tf.lite.Interpreter.
"""

from __future__ import annotations

import io
import json
import zipfile
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# tflite enums (stable flatbuffer schema values)
_PAD_SAME, _PAD_VALID = 0, 1
_ACT = {0: None, 1: "relu", 2: "relu_n1to1", 3: "relu6", 4: "tanh"}
_DTYPES = {0: np.float32, 1: np.float16, 2: np.int32, 3: np.uint8,
           4: np.int64, 6: np.bool_, 7: np.int16, 9: np.int8}


@dataclass
class _Op:
    name: str                      # builtin op name, e.g. "CONV_2D"
    inputs: List[int]              # tensor ids (-1 = absent optional input)
    outputs: List[int]
    options: Dict[str, Any] = field(default_factory=dict)


@dataclass
class TFLiteGraph:
    """Parsed, TF-free representation of one tflite subgraph."""

    ops: List[_Op]
    shapes: Dict[int, Tuple[int, ...]]          # tensor id -> shape
    constants: Dict[int, np.ndarray]            # tensor id -> fp32/int array
    inputs: List[int]
    outputs: List[int]

    # ---------- construction ----------

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TFLiteGraph":
        """Parse a .tflite flatbuffer (needs tensorflow's schema module)."""
        from tensorflow.lite.python import schema_py_generated as s

        model = s.ModelT.InitFromPackedBuf(buf, 0)
        names = {v: k for k, v in vars(s.BuiltinOperator).items()
                 if not k.startswith("_")}
        opcodes = [names[(oc.builtinCode or oc.deprecatedBuiltinCode)]
                   for oc in model.operatorCodes]
        sg = model.subgraphs[0]

        shapes, constants = {}, {}
        for tid, t in enumerate(sg.tensors):
            shapes[tid] = tuple(int(d) for d in (t.shape if t.shape is not None else []))
            data = model.buffers[t.buffer].data
            if data is not None and len(data):
                arr = np.frombuffer(bytes(data), dtype=_DTYPES[t.type])
                constants[tid] = arr.reshape(shapes[tid])

        ops: List[_Op] = []
        for op in sg.operators:
            name = opcodes[op.opcodeIndex]
            o = op.builtinOptions
            opts: Dict[str, Any] = {}
            if name in ("CONV_2D", "DEPTHWISE_CONV_2D"):
                opts = dict(padding=int(o.padding), sw=int(o.strideW),
                            sh=int(o.strideH), act=int(o.fusedActivationFunction),
                            dw=int(getattr(o, "dilationWFactor", 1)),
                            dh=int(getattr(o, "dilationHFactor", 1)))
                if name == "DEPTHWISE_CONV_2D":
                    opts["mult"] = int(o.depthMultiplier)
            elif name == "MAX_POOL_2D":
                opts = dict(padding=int(o.padding), sw=int(o.strideW),
                            sh=int(o.strideH), fw=int(o.filterWidth),
                            fh=int(o.filterHeight),
                            act=int(o.fusedActivationFunction))
            elif name in ("ADD", "SUB", "MUL", "DIV"):
                opts = dict(act=int(o.fusedActivationFunction) if o is not None else 0)
            elif name == "CONCATENATION":
                opts = dict(axis=int(o.axis),
                            act=int(o.fusedActivationFunction))
            elif name == "RESHAPE":
                if o is not None and o.newShape is not None:
                    opts = dict(new_shape=[int(d) for d in o.newShape])
            elif name in ("MEAN", "SUM"):
                opts = dict(keep_dims=bool(o.keepDims))
            elif name == "STRIDED_SLICE":
                opts = dict(begin_mask=int(o.beginMask), end_mask=int(o.endMask),
                            ellipsis_mask=int(o.ellipsisMask),
                            new_axis_mask=int(o.newAxisMask),
                            shrink_axis_mask=int(o.shrinkAxisMask))
            ops.append(_Op(name, [int(i) for i in op.inputs],
                           [int(i) for i in op.outputs], opts))

        g = cls(ops=ops, shapes=shapes, constants=constants,
                inputs=[int(i) for i in sg.inputs],
                outputs=[int(i) for i in sg.outputs])
        g._fold_dequantize()
        return g

    @classmethod
    def from_path(cls, path: str) -> "TFLiteGraph":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    @classmethod
    def from_task(cls, task_path: str, member: str) -> "TFLiteGraph":
        """Load one .tflite member out of a mediapipe .task (zip) bundle."""
        with zipfile.ZipFile(task_path) as z:
            return cls.from_bytes(z.read(member))

    def _fold_dequantize(self) -> None:
        """Fold DEQUANTIZE(const fp16) -> const fp32; rewire activations."""
        alias: Dict[int, int] = {}
        kept: List[_Op] = []
        for op in self.ops:
            if op.name == "DEQUANTIZE":
                src, dst = op.inputs[0], op.outputs[0]
                if src in self.constants:
                    self.constants[dst] = self.constants[src].astype(np.float32)
                    continue
                alias[dst] = src  # activation dequant: passthrough (fp32 math)
                continue
            op.inputs = [alias.get(i, i) for i in op.inputs]
            kept.append(op)
        self.ops = kept
        self.outputs = [alias.get(i, i) for i in self.outputs]

    # ---------- TF-free serialization ----------

    def save_npz(self, path: str) -> None:
        meta = dict(
            ops=[dict(name=o.name, inputs=o.inputs, outputs=o.outputs,
                      options=o.options) for o in self.ops],
            shapes={str(k): list(v) for k, v in self.shapes.items()},
            inputs=self.inputs, outputs=self.outputs)
        arrays = {f"t{k}": v for k, v in self.constants.items()}
        np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)

    @classmethod
    def load_npz(cls, path: str) -> "TFLiteGraph":
        z = np.load(path, allow_pickle=False)
        meta = json.loads(str(z["__meta__"]))
        return cls(
            ops=[_Op(d["name"], d["inputs"], d["outputs"], d["options"])
                 for d in meta["ops"]],
            shapes={int(k): tuple(v) for k, v in meta["shapes"].items()},
            constants={int(k[1:]): z[k] for k in z.files if k != "__meta__"},
            inputs=meta["inputs"], outputs=meta["outputs"])


# ---------- op lowering ----------

def _act(x, code):
    kind = _ACT[code]
    if kind is None:
        return x
    if kind == "relu":
        return jnp.maximum(x, 0)
    if kind == "relu6":
        return jnp.clip(x, 0, 6)
    if kind == "relu_n1to1":
        return jnp.clip(x, -1, 1)
    return jnp.tanh(x)


def _same_pads(in_size, stride, eff_k):
    out = -(-in_size // stride)
    total = max(0, (out - 1) * stride + eff_k - in_size)
    return (total // 2, total - total // 2)


def _conv2d(x, w, b, o):
    # tflite CONV_2D kernel layout: OHWI
    kh, kw = w.shape[1], w.shape[2]
    ekh, ekw = (kh - 1) * o["dh"] + 1, (kw - 1) * o["dw"] + 1
    if o["padding"] == _PAD_SAME:
        pads = [_same_pads(x.shape[1], o["sh"], ekh),
                _same_pads(x.shape[2], o["sw"], ekw)]
    else:
        pads = [(0, 0), (0, 0)]
    y = lax.conv_general_dilated(
        x, w, (o["sh"], o["sw"]), pads, rhs_dilation=(o["dh"], o["dw"]),
        dimension_numbers=("NHWC", "OHWI", "NHWC"))
    if b is not None:
        y = y + b
    return _act(y, o["act"])


def _dwconv2d(x, w, b, o):
    # tflite DW kernel layout: [1, kh, kw, cin*mult] -> HWIO group conv
    cin = x.shape[-1]
    kh, kw = w.shape[1], w.shape[2]
    wg = jnp.moveaxis(w, 0, -1).reshape(kh, kw, 1, cin * o["mult"])
    if o["padding"] == _PAD_SAME:
        pads = [_same_pads(x.shape[1], o["sh"], kh),
                _same_pads(x.shape[2], o["sw"], kw)]
    else:
        pads = [(0, 0), (0, 0)]
    y = lax.conv_general_dilated(
        x, wg, (o["sh"], o["sw"]), pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=cin)
    if b is not None:
        y = y + b
    return _act(y, o["act"])


def _maxpool(x, o):
    if o["padding"] == _PAD_SAME:
        pads = [(0, 0), _same_pads(x.shape[1], o["sh"], o["fh"]),
                _same_pads(x.shape[2], o["sw"], o["fw"]), (0, 0)]
    else:
        pads = [(0, 0)] * 4
    y = lax.reduce_window(x, -jnp.inf, lax.max,
                          (1, o["fh"], o["fw"], 1), (1, o["sh"], o["sw"], 1),
                          pads)
    return _act(y, o["act"])


def _strided_slice(x, begin, end, strides, o):
    assert o["ellipsis_mask"] == 0 and o["new_axis_mask"] == 0, \
        "ellipsis/new-axis strided-slice not in the face-model op set"
    idx = []
    for d in range(x.ndim):
        b = None if (o["begin_mask"] >> d) & 1 else int(begin[d])
        e = None if (o["end_mask"] >> d) & 1 else int(end[d])
        s = int(strides[d])
        if (o["shrink_axis_mask"] >> d) & 1:
            idx.append(int(begin[d]))
        else:
            idx.append(slice(b, e, s))
    return x[tuple(idx)]


def compile_tflite(graph: TFLiteGraph):
    """graph -> (fn, params): `fn(params, *inputs) -> [outputs]`, jittable.

    params is {tensor_id(str): fp32 array} of the graph's weight tensors —
    passed as arguments so jit never bakes them in (CLAUDE.md rule); int
    shape/axis constants are compiled into the trace as static values.
    """
    params = {str(k): jnp.asarray(v) for k, v in graph.constants.items()
              if v.dtype == np.float32 and v.size > 8}
    static = {k: v for k, v in graph.constants.items()
              if str(k) not in params}

    def fn(p, *inputs):
        env: Dict[int, Any] = {int(k): v for k, v in p.items()}
        env.update(static)
        for tid, x in zip(graph.inputs, inputs):
            env[tid] = x

        def get(i):
            return env[i] if i >= 0 else None

        for op in graph.ops:
            i, o = op.inputs, op.options
            if op.name == "CONV_2D":
                y = _conv2d(get(i[0]), get(i[1]), get(i[2]) if len(i) > 2 else None, o)
            elif op.name == "DEPTHWISE_CONV_2D":
                y = _dwconv2d(get(i[0]), get(i[1]), get(i[2]) if len(i) > 2 else None, o)
            elif op.name == "MAX_POOL_2D":
                y = _maxpool(get(i[0]), o)
            elif op.name == "PAD":
                pads = np.asarray(static.get(i[1], graph.constants[i[1]]))
                y = jnp.pad(get(i[0]), [tuple(r) for r in pads.tolist()])
            elif op.name == "RESHAPE":
                shape = (o.get("new_shape")
                         or np.asarray(graph.constants[i[1]]).tolist())
                y = jnp.reshape(get(i[0]), [int(d) for d in shape])
            elif op.name == "CONCATENATION":
                y = _act(jnp.concatenate([get(t) for t in i], axis=o["axis"]),
                         o["act"])
            elif op.name == "TRANSPOSE":
                y = jnp.transpose(get(i[0]),
                                  np.asarray(graph.constants[i[1]]).tolist())
            elif op.name == "STRIDED_SLICE":
                y = _strided_slice(get(i[0]),
                                   np.asarray(graph.constants[i[1]]),
                                   np.asarray(graph.constants[i[2]]),
                                   np.asarray(graph.constants[i[3]]), o)
            elif op.name in ("MEAN", "SUM"):
                axes = tuple(np.atleast_1d(np.asarray(graph.constants[i[1]])).tolist())
                red = jnp.mean if op.name == "MEAN" else jnp.sum
                y = red(get(i[0]), axis=axes, keepdims=o["keep_dims"])
            elif op.name == "ADD":
                y = _act(get(i[0]) + get(i[1]), o["act"])
            elif op.name == "SUB":
                y = _act(get(i[0]) - get(i[1]), o["act"])
            elif op.name == "MUL":
                y = _act(get(i[0]) * get(i[1]), o["act"])
            elif op.name == "DIV":
                y = _act(get(i[0]) / get(i[1]), o["act"])
            elif op.name == "PRELU":
                x, a = get(i[0]), get(i[1])
                y = jnp.where(x >= 0, x, x * a)
            elif op.name == "RELU":
                y = jnp.maximum(get(i[0]), 0)
            elif op.name == "LOGISTIC":
                y = jax.nn.sigmoid(get(i[0]))
            elif op.name == "NEG":
                y = -get(i[0])
            elif op.name == "SQRT":
                y = jnp.sqrt(get(i[0]))
            elif op.name == "RSQRT":
                y = lax.rsqrt(get(i[0]))
            elif op.name == "SQUARED_DIFFERENCE":
                y = jnp.square(get(i[0]) - get(i[1]))
            else:
                raise NotImplementedError(f"tflite op {op.name}")
            env[op.outputs[0]] = y
        return [env[t] for t in graph.outputs]

    return fn, params
