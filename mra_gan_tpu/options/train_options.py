"""Training flags (reference options/train_options.py:4-26)."""
from .base_options import BaseOptions


class TrainOptions(BaseOptions):
    def __init__(self):
        super().__init__()
        self.is_train = True

    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        parser.add_argument("--print_freq", type=int, default=100,
                            help="iterations between console loss prints")
        parser.add_argument("--save_latest_freq", type=int, default=1000,
                            help="iterations between 'latest' checkpoint saves")
        parser.add_argument("--save_epoch_freq", type=int, default=200,
                            help="epochs between numbered checkpoint saves")
        parser.add_argument("--continue_train", action="store_true",
                            help="continue training: load the latest model")
        parser.add_argument("--epoch_count", type=int, default=1,
                            help="the starting epoch count")
        parser.add_argument("--phase", type=str, default="train")
        parser.add_argument("--which_epoch", type=str, default="latest",
                            help="which epoch to load (with --continue_train)")
        parser.add_argument("--niter", type=int, default=500,
                            help="# of epochs at the starting learning rate")
        parser.add_argument("--niter_decay", type=int, default=100,
                            help="# of epochs to linearly decay learning rate to zero")
        parser.add_argument("--beta1", type=float, default=0.5, help="momentum term of adam")
        parser.add_argument("--lr", type=float, default=0.0002,
                            help="initial learning rate for adam")
        # Reference-faithful inverted flag (reference options/train_options.py
        # :19 is store_false): DEFAULT no_lsgan=True trains vanilla GAN with a
        # sigmoid discriminator (reference models/cycle_gan_model.py:93,103);
        # PASSING --no_lsgan flips no_lsgan to False = least-squares GAN.
        parser.add_argument("--no_lsgan", action="store_false",
                            help="switch to least-squares GAN (the default, like "
                                 "the reference's, is vanilla GAN + sigmoid D; "
                                 "the flag name is inverted in the reference "
                                 "and kept for CLI compatibility)")
        parser.add_argument("--pool_size", type=int, default=50,
                            help="size of the generated-image replay buffer")
        parser.add_argument("--lr_policy", type=str, default="lambda",
                            help="lambda | step | plateau | cosine")
        parser.add_argument("--lr_decay_iters", type=int, default=50,
                            help="decay LR by 0.1 every lr_decay_iters epochs (step policy)")
        parser.add_argument("--profile_dir", type=str, default="",
                            help="write a JAX profiler trace of the first epoch here")
        parser.add_argument("--augment", action="store_true",
                            help="random on-device augmentation of each patch batch "
                                 "(noise/blur/rotate/bspline/flip/brightness/contrast)")
        parser.add_argument("--augment_extended", action="store_true",
                            help="with --augment: also enable the reference's "
                                 "unreachable choices 8-12 (in-plane translate, "
                                 "single-axis z/x/y rotations, gamma imadjust; "
                                 "reference utils/NiftiDataset.py:1243-1300)")
        parser.add_argument("--remat", action="store_true",
                            help="rematerialize generator activations in the "
                                 "backward pass (jax.checkpoint with "
                                 "segment-boundary policy): ~20-25%% less "
                                 "peak memory for ~30%% more step time — "
                                 "for patches that otherwise exceed HBM")
        parser.add_argument("--dump_patches", type=int, default=0,
                            help="write the first N sampled patch pairs of "
                                 "the run to <checkpoints>/<name>/patch_dumps/"
                                 " as .nii.gz for offline QA (mechanized "
                                 "version of the reference's commented dump "
                                 "blocks, reference train.py:83-107)")
        parser.add_argument("--no_mem_check", action="store_true",
                            help="skip the compile-only device-memory "
                                 "preflight of the train step (core/memory.py)")
        parser.add_argument("--hbm_limit_gib", type=float, default=0.0,
                            help="per-device memory budget in GiB for the "
                                 "preflight check (0 = use the runtime's "
                                 "reported limit when available)")
        return parser
