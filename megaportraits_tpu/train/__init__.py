from megaportraits_tpu.train.state import TrainState, make_optimizer
