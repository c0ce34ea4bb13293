"""Inference flags (reference options/test_options.py:4-21) with portable
defaults instead of the reference's hard-coded host paths (SURVEY §2.2 #8)."""
from .base_options import BaseOptions


class TestOptions(BaseOptions):
    __test__ = False  # not a pytest class (silences a collection warning)

    def __init__(self):
        super().__init__()
        self.is_train = False

    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        parser.add_argument("--image", type=str, default="./Data_folder/test/images/0.nii",
                            help="input volume (.nii/.nii.gz), or a "
                                 "DIRECTORY of volumes to decode in batch")
        parser.add_argument("--result", type=str, default="./result.nii",
                            help="path to the .nii result to save (a "
                                 "directory when --image is a directory)")
        parser.add_argument("--phase", type=str, default="test")
        parser.add_argument("--which_epoch", type=str, default="latest",
                            help="which checkpoint epoch to load")
        parser.add_argument("--stride_inplane", type=int, default=32,
                            help="sliding-window stride in the XY plane")
        parser.add_argument("--stride_layer", type=int, default=32,
                            help="sliding-window stride along Z")
        # --model_suffix is injected by the 'test' model's
        # modify_commandline_options hook (models/test.py), like the
        # reference's dynamic flag registration.
        parser.add_argument("--single_pass", action="store_true",
                            help="decode the WHOLE volume in one generator "
                                 "forward on one chip (no patching, no "
                                 "seams; needs the activation stack to fit "
                                 "HBM — use --spatial_shard beyond that)")
        parser.add_argument("--spatial_shard", action="store_true",
                            help="decode the WHOLE volume in one pass with "
                                 "the volume depth-sharded across all devices "
                                 "(halo-exchange convs) instead of "
                                 "sliding-window patching; works for any "
                                 "netG whose depth rule the volume meets "
                                 "(parallel/spatial.py spatial_depth_rule — "
                                 "resnet, unet_*, Dynet)")
        parser.add_argument("--pad_mode", type=str, default="reference",
                            choices=["reference", "symmetric"],
                            help="sub-patch volume padding: 'reference' "
                                 "zero-extends at the high side like the "
                                 "reference's same-spacing BSpline Padding "
                                 "(utils/NiftiDataset.py:876-932); "
                                 "'symmetric' centers the content")
        parser.add_argument("--blend", type=str, default="gaussian",
                            choices=["gaussian", "uniform"],
                            help="patch overlap blending window")
        parser.add_argument("--decode_batch", type=int, default=8,
                            help="patches decoded per generator call in the "
                                 "sliding-window path (exact math at any "
                                 "value — only amortization changes; 8 "
                                 "matches bench.py; lower it if a large "
                                 "patch size overflows HBM)")
        parser.add_argument("--wire", type=str, default="exact",
                            choices=["exact", "f32", "f16"],
                            help="host<->device wire precision for the "
                                 "streamed decode. 'exact': bfloat16 upload "
                                 "(bit-exact for the bf16 generator) + "
                                 "float32 download; 'f32': float32 both "
                                 "ways; 'f16': bfloat16 upload + float16 "
                                 "download (~5e-4 output quantization, "
                                 "fastest)")
        parser.set_defaults(model="test")
        return parser
