from megaportraits_tpu.models.resnet import ResNet18, ResNet50, CustomResNet50
from megaportraits_tpu.models.repvgg import (
    RepVGG,
    SixDRepNet,
    rotation_6d_to_matrix,
    euler_angles_from_matrix,
)
from megaportraits_tpu.models.eapp import Eapp
from megaportraits_tpu.models.emtn import Emtn
from megaportraits_tpu.models.warpgen import FlowField, WarpGenerator
from megaportraits_tpu.models.g3d import G3d
from megaportraits_tpu.models.g2d import G2d
from megaportraits_tpu.models.gbase import Gbase
from megaportraits_tpu.models.genh import Genh, GHR
from megaportraits_tpu.models.student import Student
from megaportraits_tpu.models.discriminator import Discriminator
