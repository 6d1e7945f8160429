from halogen_tpu.cli.main import main
