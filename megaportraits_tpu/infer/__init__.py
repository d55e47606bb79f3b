from megaportraits_tpu.infer.inference import inference_base, load_image
