from megaportraits_tpu.losses.gan import (
    discriminator_loss,
    generator_adversarial_loss,
    hinge_real_fake_loss,
    feature_matching_loss,
)
from megaportraits_tpu.losses.cycle import cosine_loss
from megaportraits_tpu.losses.perceptual import VGG, LPIPS, PerceptualLoss
from megaportraits_tpu.losses.pairwise import (
    pairwise_transfer_loss,
    identity_similarity_loss,
)
