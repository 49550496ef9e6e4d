from drake_tpu.rl.env import DrakeGymEnv, VectorizedEnv  # noqa: F401
