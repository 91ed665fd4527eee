import os

def outer(x):
    """Outer does things.

    Across multiple lines.
    """
    import json

    def inner(y):
        """Inner helper."""
        return y * 2

    return inner(x)
