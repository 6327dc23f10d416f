"""Entry-point experiment drivers matching the reference's run.py /
run_synthetic.py / run_luma.py / compile_luma.py / test_luma.py."""
