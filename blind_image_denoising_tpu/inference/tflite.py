"""TFLite → JAX graph executor.

Loads a .tflite flatbuffer (e.g. the reference's shipped pretrained
denoiser, reference bfcnn/pretrained/unet_laplacian_v5.6/denoiser_model.tflite,
produced by export_model.py:143-162 with SELECT_TF_OPS) and rebuilds it as
a pure JAX function that jits onto TPU.

Why: the reference's pretrained SavedModel .pb is stripped from the
snapshot, and its TFLite uses Flex ops the bundled interpreter can't run —
but the flatbuffer itself carries the full graph + weights. Executing it in
JAX gives (a) the pretrained model served TPU-native and (b) numerical
ground truth for weight-import parity tests.

Static-shape discipline: TFLite encodes any-size support with SHAPE/PACK/
FILL/STRIDED_SLICE arithmetic. Under jit the input shape is static, so all
shape math here is evaluated with numpy at trace time (ops dispatch to
numpy when every operand is host data) and the traced graph XLA sees is a
fixed-shape program per input-shape bucket — the same bucketing the
any-size Denoiser uses.
"""

import math
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..logger import logger

# TFLite enums (tensorflow/lite/schema/schema.fbs)
_DTYPES = {0: np.float32, 1: np.float16, 2: np.int32, 3: np.uint8,
           4: np.int64, 6: np.bool_, 7: np.int16, 9: np.int8,
           10: np.float64, 17: np.uint32}
_PAD_SAME, _PAD_VALID = 0, 1
_ACT = {0: None, 1: "relu", 2: "relu_n1_to_1", 3: "relu6", 4: "tanh"}


def _is_host(*vals) -> bool:
    return all(isinstance(v, (np.ndarray, np.generic, int, float, bool, list))
               for v in vals)


def _np_or_jnp(*vals):
    return np if _is_host(*vals) else jnp


class _Op:
    __slots__ = ("name", "inputs", "outputs", "options")

    def __init__(self, name, inputs, outputs, options):
        self.name = name
        self.inputs = inputs
        self.outputs = outputs
        self.options = options


def _parse(path: str):
    """Parse the flatbuffer into (ops, constants, input_ids, output_ids)."""
    from tensorflow.lite.python import schema_py_generated as schema

    buf = open(path, "rb").read()
    model = schema.Model.GetRootAsModel(buf, 0)
    sg = model.Subgraphs(0)

    opcode_names = {}
    builtin_names = {v: k for k, v in schema.BuiltinOperator.__dict__.items()
                     if not k.startswith("_")}
    for i in range(model.OperatorCodesLength()):
        oc = model.OperatorCodes(i)
        code = max(oc.BuiltinCode(), oc.DeprecatedBuiltinCode())
        name = builtin_names.get(code, f"UNKNOWN_{code}")
        if name == "CUSTOM":
            name = "CUSTOM:" + oc.CustomCode().decode()
        opcode_names[i] = name

    # constant tensors (dequantize int8 dynamic-range-quantized weights —
    # the reference exports with Optimize.DEFAULT, export_model.py:160)
    constants: Dict[int, np.ndarray] = {}
    tensor_dtype: Dict[int, Any] = {}
    for t in range(sg.TensorsLength()):
        tensor = sg.Tensors(t)
        tensor_dtype[t] = _DTYPES.get(tensor.Type(), np.float32)
        b = model.Buffers(tensor.Buffer())
        if b.DataLength() > 0:
            data = b.DataAsNumpy().view(tensor_dtype[t])
            shape = tensor.ShapeAsNumpy()
            shape = shape if isinstance(shape, np.ndarray) else np.array([], int)
            arr = data.reshape(shape.tolist() if len(shape) else [])
            q = tensor.Quantization()
            if (arr.dtype == np.int8 and q is not None
                    and q.ScaleLength() > 0):
                scale = q.ScaleAsNumpy().astype(np.float32)
                zp = (q.ZeroPointAsNumpy().astype(np.float32)
                      if q.ZeroPointLength() > 0 else np.zeros_like(scale))
                qdim = q.QuantizedDimension()
                bshape = [1] * arr.ndim
                if scale.size > 1:
                    bshape[qdim] = scale.size
                scale = scale.reshape(bshape)
                zp = zp.reshape(bshape)
                arr = (arr.astype(np.float32) - zp) * scale
                tensor_dtype[t] = np.float32
            constants[t] = arr

    def options_of(op, cls_name):
        cls = getattr(schema, cls_name, None)
        tab = op.BuiltinOptions()
        if cls is None or tab is None:
            return None
        o = cls()
        o.Init(tab.Bytes, tab.Pos)
        return o

    ops: List[_Op] = []
    for i in range(sg.OperatorsLength()):
        op = sg.Operators(i)
        name = opcode_names[op.OpcodeIndex()]
        inputs = [op.Inputs(j) for j in range(op.InputsLength())]
        outputs = [op.Outputs(j) for j in range(op.OutputsLength())]
        opts: Dict[str, Any] = {}
        if name == "CONV_2D":
            o = options_of(op, "Conv2DOptions")
            opts = dict(stride=(o.StrideH(), o.StrideW()),
                        padding=o.Padding(),
                        dilation=(o.DilationHFactor(), o.DilationWFactor()),
                        activation=_ACT.get(o.FusedActivationFunction()))
        elif name == "DEPTHWISE_CONV_2D":
            o = options_of(op, "DepthwiseConv2DOptions")
            opts = dict(stride=(o.StrideH(), o.StrideW()),
                        padding=o.Padding(),
                        dilation=(o.DilationHFactor(), o.DilationWFactor()),
                        activation=_ACT.get(o.FusedActivationFunction()),
                        depth_multiplier=o.DepthMultiplier())
        elif name in ("ADD", "SUB", "MUL", "DIV"):
            o = options_of(op, name.capitalize() + "Options")
            opts = dict(activation=_ACT.get(
                o.FusedActivationFunction()) if o else None)
        elif name == "MEAN":
            o = options_of(op, "ReducerOptions")
            opts = dict(keep_dims=bool(o.KeepDims()) if o else False)
        elif name == "STRIDED_SLICE":
            o = options_of(op, "StridedSliceOptions")
            opts = dict(begin_mask=o.BeginMask(), end_mask=o.EndMask(),
                        ellipsis_mask=o.EllipsisMask(),
                        new_axis_mask=o.NewAxisMask(),
                        shrink_axis_mask=o.ShrinkAxisMask())
        elif name == "RESIZE_BILINEAR":
            o = options_of(op, "ResizeBilinearOptions")
            opts = dict(align_corners=bool(o.AlignCorners()),
                        half_pixel_centers=bool(o.HalfPixelCenters()))
        elif name == "RESHAPE":
            # 1-input form carries the target shape in ReshapeOptions
            # (the 2-input form passes it as a constant tensor instead)
            o = options_of(op, "ReshapeOptions")
            if o is not None and o.NewShapeLength():
                opts = dict(new_shape=[int(o.NewShape(j))
                                       for j in range(o.NewShapeLength())])
        elif name == "BATCH_MATMUL":
            o = options_of(op, "BatchMatMulOptions")
            opts = dict(adj_x=bool(o.AdjX()), adj_y=bool(o.AdjY()))
        elif name == "SOFTMAX":
            o = options_of(op, "SoftmaxOptions")
            opts = dict(beta=o.Beta() if o else 1.0)
        elif name == "LEAKY_RELU":
            o = options_of(op, "LeakyReluOptions")
            opts = dict(alpha=o.Alpha() if o else 0.2)
        elif name == "CAST":
            pass
        elif name == "PACK":
            o = options_of(op, "PackOptions")
            opts = dict(axis=o.Axis() if o else 0)
        elif name == "CONCATENATION":
            o = options_of(op, "ConcatenationOptions")
            opts = dict(axis=o.Axis() if o else 0)
        elif name.startswith("CUSTOM:Flex"):
            co = op.CustomOptionsAsNumpy()
            opts = dict(raw=bytes(co) if not isinstance(co, int) else b"")
        ops.append(_Op(name, inputs, outputs, opts))

    input_ids = [sg.Inputs(i) for i in range(sg.InputsLength())]
    output_ids = [sg.Outputs(i) for i in range(sg.OutputsLength())]
    return ops, constants, input_ids, output_ids, tensor_dtype


def _apply_fused_activation(y, act: Optional[str]):
    if act is None:
        return y
    mod = _np_or_jnp(y)
    if act == "relu":
        return mod.maximum(y, 0)
    if act == "relu6":
        return mod.clip(y, 0, 6)
    if act == "relu_n1_to_1":
        return mod.clip(y, -1, 1)
    if act == "tanh":
        return mod.tanh(y)
    raise NotImplementedError(f"fused activation {act}")


def _conv2d(x, w, bias, opts, groups=1):
    pad = "SAME" if opts["padding"] == _PAD_SAME else "VALID"
    # TFLite conv weights are OHWI; lax wants HWIO
    kernel = jnp.transpose(jnp.asarray(w), (1, 2, 3, 0))
    y = lax.conv_general_dilated(
        jnp.asarray(x), kernel,
        window_strides=opts["stride"], padding=pad,
        rhs_dilation=opts.get("dilation", (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if bias is not None:
        y = y + jnp.asarray(bias)
    return _apply_fused_activation(y, opts.get("activation"))


def _strided_slice(x, begin, end, strides, opts):
    begin = np.asarray(begin).tolist()
    end = np.asarray(end).tolist()
    strides = np.asarray(strides).tolist()
    ndim = len(begin)
    if opts.get("ellipsis_mask") or opts.get("new_axis_mask"):
        raise NotImplementedError("ellipsis/new_axis in STRIDED_SLICE")
    idx = []
    for d in range(ndim):
        b = None if (opts["begin_mask"] >> d) & 1 else begin[d]
        e = None if (opts["end_mask"] >> d) & 1 else end[d]
        if (opts["shrink_axis_mask"] >> d) & 1:
            idx.append(begin[d])
        else:
            idx.append(slice(b, e, strides[d]))
    return x[tuple(idx)]


def _resize_bilinear(x, size, opts):
    size = np.asarray(size).tolist()
    b, h, w, c = x.shape
    if opts.get("align_corners"):
        raise NotImplementedError("align_corners resize")
    if opts.get("half_pixel_centers"):
        return jax.image.resize(jnp.asarray(x), (b, size[0], size[1], c),
                                method="bilinear")
    # legacy TF1 grid (hpc=False, the flatbuffer default): src = dst*scale
    # — jax.image.resize always uses half-pixel centers, whose grid is
    # shifted by (scale-1)/2, so gather explicitly
    x = jnp.asarray(x)
    out_h, out_w = int(size[0]), int(size[1])
    ys = jnp.arange(out_h, dtype=jnp.float32) * (h / out_h)
    xs = jnp.arange(out_w, dtype=jnp.float32) * (w / out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0.astype(jnp.float32)).reshape(1, out_h, 1, 1)
    wx = (xs - x0.astype(jnp.float32)).reshape(1, 1, out_w, 1)
    rows0, rows1 = x[:, y0], x[:, y1]
    top = rows0[:, :, x0] * (1 - wx) + rows0[:, :, x1] * wx
    bot = rows1[:, :, x0] * (1 - wx) + rows1[:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class TFLiteExecutor:
    """Execute a parsed TFLite graph with jnp (traceable under jit)."""

    def __init__(self, path: str):
        (self._ops, self._constants, self._input_ids,
         self._output_ids, self._dtypes) = _parse(path)
        logger.info(f"tflite graph: {len(self._ops)} ops, "
                    f"{len(self._constants)} constants")

    def __call__(self, *inputs):
        env: Dict[int, Any] = dict(self._constants)
        for tid, value in zip(self._input_ids, inputs):
            env[tid] = value

        for op in self._ops:
            self._execute(op, env)

        outs = [env[t] for t in self._output_ids]
        return outs[0] if len(outs) == 1 else outs

    # ---- op dispatch -----------------------------------------------------
    def _execute(self, op: _Op, env: Dict[int, Any]):
        def inp(i):
            t = op.inputs[i]
            return None if t == -1 else env[t]

        name, opts = op.name, op.options
        if name == "CONV_2D":
            y = _conv2d(inp(0), inp(1), inp(2), opts)
        elif name == "DEPTHWISE_CONV_2D":
            x, w = inp(0), inp(1)
            # TFLite DW weights are 1HWC(out); out = in * depth_multiplier
            in_ch = x.shape[-1]
            kernel = jnp.transpose(jnp.asarray(w), (1, 2, 0, 3))  # H W 1 C
            y = lax.conv_general_dilated(
                jnp.asarray(x), kernel,
                window_strides=opts["stride"],
                padding="SAME" if opts["padding"] == _PAD_SAME else "VALID",
                rhs_dilation=opts.get("dilation", (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=in_ch)
            if inp(2) is not None:
                y = y + jnp.asarray(inp(2))
            y = _apply_fused_activation(y, opts.get("activation"))
        elif name == "CUSTOM:FlexConv2D":
            # The reference graph carries exactly one Flex conv (the traced
            # tf.nn conv with dynamic padding); semantics = SAME/stride-1.
            x, w = inp(0), inp(1)
            kernel = jnp.asarray(w)  # Flex TF conv keeps HWIO already
            y = lax.conv_general_dilated(
                jnp.asarray(x), kernel, window_strides=(1, 1),
                padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        elif name in ("ADD", "SUB", "MUL", "DIV", "SQUARED_DIFFERENCE",
                      "MINIMUM", "MAXIMUM", "POW", "FLOOR_DIV"):
            a, b = inp(0), inp(1)
            mod = _np_or_jnp(a, b)
            if name == "ADD":
                y = a + b
            elif name == "SUB":
                y = a - b
            elif name == "MUL":
                y = a * b
            elif name == "DIV":
                y = a / b
            elif name == "SQUARED_DIFFERENCE":
                y = mod.square(a - b)
            elif name == "MINIMUM":
                y = mod.minimum(a, b)
            elif name == "MAXIMUM":
                y = mod.maximum(a, b)
            elif name == "POW":
                y = mod.power(a, b)
            else:
                y = a // b
            y = _apply_fused_activation(y, opts.get("activation"))
        elif name == "MEAN":
            axes = tuple(np.asarray(inp(1)).ravel().tolist())
            mod = _np_or_jnp(inp(0))
            y = mod.mean(inp(0), axis=axes, keepdims=opts["keep_dims"])
        elif name == "RSQRT":
            y = (1.0 / np.sqrt(inp(0))) if _is_host(inp(0)) \
                else lax.rsqrt(inp(0))
        elif name in ("LOG", "CEIL", "ROUND", "TANH", "RELU", "GELU",
                      "FLOOR", "EXP", "SQRT", "ABS", "NEG"):
            x = inp(0)
            if name == "GELU":
                y = jax.nn.gelu(jnp.asarray(x), approximate=False)
            elif name == "RELU":
                y = _np_or_jnp(x).maximum(x, 0)
            elif name == "ROUND":
                # TF rounds half-to-even
                y = _np_or_jnp(x).round(x)
            else:
                fn = {"LOG": "log", "CEIL": "ceil", "TANH": "tanh",
                      "FLOOR": "floor", "EXP": "exp", "SQRT": "sqrt",
                      "ABS": "abs", "NEG": "negative"}[name]
                y = getattr(_np_or_jnp(x), fn)(x)
        elif name == "LEAKY_RELU":
            y = jax.nn.leaky_relu(jnp.asarray(inp(0)), opts["alpha"])
        elif name == "SOFTMAX":
            y = jax.nn.softmax(jnp.asarray(inp(0)) * opts.get("beta", 1.0),
                               axis=-1)
        elif name == "BATCH_MATMUL":
            a, b = jnp.asarray(inp(0)), jnp.asarray(inp(1))
            if opts.get("adj_x"):
                a = jnp.swapaxes(a, -1, -2)
            if opts.get("adj_y"):
                b = jnp.swapaxes(b, -1, -2)
            y = jnp.matmul(a, b)
        elif name == "RESHAPE":
            shape = np.asarray(inp(1)).ravel().tolist() \
                if len(op.inputs) > 1 and inp(1) is not None else None
            if shape is None:
                shape = opts.get("new_shape")
            if shape is None:
                raise NotImplementedError(
                    "RESHAPE without a shape tensor or ReshapeOptions")
            x = inp(0)
            y = _np_or_jnp(x).reshape(x, shape)
        elif name == "SHAPE":
            x = inp(0)
            y = np.asarray(x.shape, np.int32)   # static under jit
        elif name == "TRANSPOSE":
            perm = np.asarray(inp(1)).ravel().tolist()
            x = inp(0)
            y = _np_or_jnp(x).transpose(x, perm)
        elif name == "PACK":
            vals = [inp(i) for i in range(len(op.inputs))]
            y = _np_or_jnp(*vals).stack(vals, axis=opts.get("axis", 0))
        elif name == "CONCATENATION":
            vals = [inp(i) for i in range(len(op.inputs))]
            y = _np_or_jnp(*vals).concatenate(vals, axis=opts.get("axis", 0))
        elif name == "FILL":
            shape = np.asarray(inp(0)).ravel().tolist()
            value = inp(1)
            if _is_host(value):
                y = np.full(shape, value)
            else:
                y = jnp.full(shape, value)
        elif name == "CAST":
            x = inp(0)
            out_dtype = self._dtypes[op.outputs[0]]
            y = x.astype(out_dtype) if _is_host(x) \
                else x.astype(jnp.dtype(out_dtype))
        elif name == "STRIDED_SLICE":
            y = _strided_slice(inp(0), inp(1), inp(2), inp(3), opts)
        elif name == "SLICE":
            begin = np.asarray(inp(1)).ravel().tolist()
            size = np.asarray(inp(2)).ravel().tolist()
            x = inp(0)
            idx = tuple(slice(b, None if s == -1 else b + s)
                        for b, s in zip(begin, size))
            y = x[idx]
        elif name == "PAD":
            pads = np.asarray(inp(1)).tolist()
            x = inp(0)
            y = _np_or_jnp(x).pad(x, pads) if _is_host(x) \
                else jnp.pad(x, pads)
        elif name == "RESIZE_BILINEAR":
            y = _resize_bilinear(inp(0), inp(1), opts)
        elif name == "BROADCAST_TO":
            shape = np.asarray(inp(1)).ravel().tolist()
            x = inp(0)
            y = np.broadcast_to(x, shape) if _is_host(x) \
                else jnp.broadcast_to(x, shape)
        else:
            raise NotImplementedError(f"TFLite op [{name}] not implemented")

        env[op.outputs[0]] = y


def load_tflite_denoiser(path: str):
    """Build a jitted any-size uint8 denoiser from a .tflite file.

    Returns ``fn(image_uint8 [B,H,W,C]) -> uint8`` — jit-cached per input
    shape (the graph itself pads to pow2 internally, mirroring the
    reference DenoiserModule semantics baked into the artifact)."""
    executor = TFLiteExecutor(path)

    @jax.jit
    def fn(x):
        return executor(x)

    return fn
