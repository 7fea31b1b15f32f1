from .step import cross_entropy_sum, make_train_step, make_eval_step
