"""Small helpers (reference ``utils/misc.py``)."""


def filter_dict(dictionary, keywords):
    """Keys of ``keywords`` present in ``dictionary`` (``misc.py``)."""
    return [key for key in keywords if key in dictionary]


def make_list(var, n=None):
    """Wrap into a list and optionally broadcast to length n (``misc.py``)."""
    var = var if isinstance(var, list) else [var]
    if n is None:
        return var
    if len(var) == 1:
        return var * n
    assert len(var) == n, 'Wrong list length for make_list'
    return var


def same_shape(shape1, shape2):
    return tuple(shape1) == tuple(shape2)


# parse_crop_borders lives with the other host-side sample ops:
from mindtheedge_tpu.data.augmentations import parse_crop_borders  # noqa: F401,E402
