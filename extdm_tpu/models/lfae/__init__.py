from extdm_tpu.models.lfae.bg_predictor import BGMotionPredictor
from extdm_tpu.models.lfae.generator import Generator, deform_input
from extdm_tpu.models.lfae.pixelwise_flow import PixelwiseFlowPredictor
from extdm_tpu.models.lfae.recon_model import ReconstructionModel
from extdm_tpu.models.lfae.region_predictor import RegionPredictor
from extdm_tpu.models.lfae.vgg import Vgg19Features

__all__ = [
    "BGMotionPredictor",
    "Generator",
    "deform_input",
    "PixelwiseFlowPredictor",
    "ReconstructionModel",
    "RegionPredictor",
    "Vgg19Features",
]
