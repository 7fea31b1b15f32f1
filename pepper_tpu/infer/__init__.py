from .runner import InferenceRunner, fake_predict
