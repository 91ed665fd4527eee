import os
from pathlib import Path

def greet(name):
    """Say hello to name."""
    msg = f"hello {name}"
    return msg

def add(a, b):
    return a + b

class Greeter:
    def __init__(self):
        self.count = 0

    def run(self):
        return greet("world")
