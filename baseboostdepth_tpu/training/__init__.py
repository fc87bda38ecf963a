"""Training system: static-slot batch layout, jitted train step, curriculum
schedule, optimizer/LR, checkpointing, and the Trainer orchestration loop."""
