from .models import ModelBundle, load_bundle, encode_prompts  # noqa: F401
