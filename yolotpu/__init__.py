"""yolotpu — a TPU-native YOLOv2 INT16 detection framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of the reference FPGA stack
(solomontesema/yolo-fpga-accelerator) re-designed TPU-first:

- darknet ``.cfg`` graphs are parsed into a typed layer list and traced into
  ONE jitted XLA program (the reference launches 32 separate accelerator
  calls; see reference ``hls/models/yolov2/yolo2_model.cpp:294-446``).
- INT16 quantization with per-layer power-of-two Q tables follows the
  reference artifact contract (``weights/README.md``, ``yolo2_model.cpp:158-227``)
  with convolution accumulating in int32 on the MXU.
- Postprocess (region decode, class-wise NMS, letterbox inverse) matches the
  darknet host reference (``src/core/yolo_region.cpp``, ``yolo_post.cpp``).

Public entry points:
    yolotpu.graph.NetworkSpec.from_cfg(path)   — parse a darknet cfg
    yolotpu.weights.WeightStore                — load/generate weight artifacts
    yolotpu.models.yolov2.build_forward(...)   — jitted TPU forward
    yolotpu.golden.GoldenNet                   — numpy fp32/int16 oracle
    yolotpu.cli.detect                         — `yolov2_detect`-compatible CLI
"""

__version__ = "0.1.0"


def _honor_cpu_platform_env() -> None:
    """Make ``JAX_PLATFORMS=cpu`` authoritative even on hosts whose site
    hooks register+initialize an accelerator backend at interpreter start
    (observed with tunneled-TPU plugins: a "CPU-only" CLI run otherwise
    contends for the single device grant and blocks for minutes in the
    claim path). No-op unless the user explicitly asked for cpu."""
    import os
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        return
    try:
        import jax
        if jax.config.jax_platforms != "cpu":
            jax.config.update("jax_platforms", "cpu")
        import jax._src.api as _api
        _api.clear_backends()
    except Exception:   # jax absent or too old: nothing to enforce
        pass


_honor_cpu_platform_env()
