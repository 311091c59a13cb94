#!/usr/bin/env python
"""Generate the 11 recipe directories (run.sh / path.sh / cmd.sh / conf).

The reference ships one hand-written ~350-line run.sh per recipe
(`egs/{arctic,ljspeech,m-ailabs-speech}/*/run.sh`); here the recipes are
emitted from a single template so the 7-stage pipeline logic lives in one
place.  Re-run this script after editing the template:

    python egs/gen_recipes.py
"""

from __future__ import annotations

import os
import stat

EGS = os.path.dirname(os.path.abspath(__file__))

F0_CONF = {
    "awb": "65 210", "bdl": "70 210", "clb": "110 270", "jmk": "60 210",
    "ksp": "60 210", "rms": "55 200", "slt": "120 275",
}

PATH_SH = """export PRJ_ROOT=${PRJ_ROOT:-../../..}
export PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-}
export PATH=$PATH:$PRJ_ROOT/pytorchwavenetvocoder_tpu/bin:$PRJ_ROOT/egs/utils
"""

CMD_SH = """# Job dispatch configuration.  run.py executes locally; slurm.py submits
# through srun (falling back to local when slurm is absent).  The --gpu
# flag carries the device count to the tools via WN_NUM_DEVICES.

# for local
export train_cmd="run.py"
export cuda_cmd="run.py --gpu 1"

# for slurm (configuration in conf/slurm.conf)
# export train_cmd="slurm.py --config conf/slurm.conf"
# export cuda_cmd="slurm.py --gpu 1 --config conf/slurm.conf"
"""

SLURM_CONF = """# slurm.py option-translation config (slurm.pl format):
# 'command' is the submission command; 'option key=* <template>' maps
# --key <val> with $0 substituted; exact-value lines override; 'default'
# applies when the flag wasn't passed.
command sbatch --export=PATH --ntasks-per-node=1
option time=* --time $0
option mem=* --mem-per-cpu $0
option mem=0
option num_threads=* --cpus-per-task $0 --ntasks-per-node=1
option num_threads=1 --cpus-per-task 1 --ntasks-per-node=1
default gpu=0
option gpu=0
option gpu=* --gres=gpu:$0 --time 10-00:00:00
"""


def header(title):
    return f"""#!/bin/bash
############################################################
#{title.center(58)}#
############################################################

# TPU-native WaveNet vocoder recipe (7-stage pipeline; stage-for-stage
# equivalent of the reference kan-bayashi/PytorchWaveNetVocoder recipe).

. ./path.sh || exit 1;
. ./cmd.sh || exit 1;

# USER SETTINGS {{{{{{
#######################################
#           STAGE SETTING             #
#######################################
stage=0123456
# 0: data preparation step
# 1: feature extraction step
# 2: statistics calculation step
# 3: noise weighting step
# 4: training step
# 5: decoding step
# 6: noise shaping step
"""


def gen_run_sh(r):
    ft = r["feature_type"]
    lines = [header(r["title"])]

    # ---------------- feature settings ----------------
    lines.append("""
#######################################
#          FEATURE SETTING            #
#######################################""")
    lines.append(f"feature_type={ft}  # world or melspc (fixed in this recipe)")
    if "spk" in r:
        lines.append(f"spk={r['spk']}  # {r.get('spk_comment', 'target speaker')}")
    if "spks" in r:
        lines.append(f"spks=({' '.join(r['spks'])}) # target speakers")
    if "train_spks" in r:
        lines.append(f"train_spks=({' '.join(r['train_spks'])}) # speakers for training")
        lines.append(f"eval_spks=({' '.join(r['eval_spks'])})  # speakers for evaluation")
    if ft == "world":
        if r.get("f0_from_conf"):
            lines.append('minf0=""               # minimum f0 (if not set, conf/*.f0 will be used)')
            lines.append('maxf0=""               # maximum f0 (if not set, conf/*.f0 will be used)')
        else:
            lines.append(f"minf0={r.get('minf0', 40)}               # minimum f0")
            lines.append(f"maxf0={r.get('maxf0', 400)}              # maximum f0")
    else:
        lines.append(f"mspc_dim={r.get('mspc_dim', 80)}            # dimension of mel-spectrogram")
        lines.append('fmin=""                # minimum frequency in melspc calculation')
        lines.append('fmax=""                # maximum frequency in melspc calculation')
    lines.append(f"shiftms={r['shiftms']}              # shift length in msec")
    lines.append(f"fftl={r.get('fftl', 1024)}              # fft length")
    lines.append("highpass_cutoff=70     # highpass filter cutoff frequency (0 = off)")
    lines.append(f"fs={r['fs']}               # sampling rate")
    lines.append(f"mcep_dim={r['mcep_dim']}            # dimension of mel-cepstrum")
    lines.append(f"mcep_alpha={r['mcep_alpha']}       # alpha value of mel-cepstrum")
    lines.append("use_noise_shaping=true # whether to use noise shaping")
    lines.append("mag=0.5                # strength of noise shaping (0.0 < mag <= 1.0)")
    lines.append("n_jobs=10              # number of parallel jobs")

    # ---------------- training settings ----------------
    t = r.get("train", {})
    lines.append(f"""
#######################################
#          TRAINING SETTING           #
#######################################
n_devices=1               # number of TPU devices (data-parallel mesh)
n_quantize=256            # number of quantization of waveform
n_aux={r['n_aux']}                  # number of auxiliary features
n_resch={t.get('n_resch', 512)}               # number of residual channels
n_skipch={t.get('n_skipch', 256)}              # number of skip channels
dilation_depth={t.get('dilation_depth', 10)}         # dilation depth
dilation_repeat={t.get('dilation_repeat', 3)}         # number of dilation repeats
kernel_size={r.get('kernel_size', 2)}             # kernel size of dilated convolution
lr=1e-4                   # learning rate
weight_decay=0.0          # weight decay coef
iters={t.get('iters', 200000)}              # number of iterations
batch_length={t.get('batch_length', 20000)}        # batch length
batch_size=1              # batch size
checkpoint_interval={t.get('checkpoint_interval', 10000)} # save model per this number
use_upsampling=true       # whether to use upsampling layer
resume=""                 # checkpoint path to resume (Optional)

#######################################
#          DECODING SETTING           #
#######################################
outdir=""            # directory to save decoded wav dir (Optional)
checkpoint=""        # checkpoint path to be used for decoding (Optional)
config=""            # model configuration path (Optional)
stats=""             # statistics path (Optional)
feats=""             # list or directory of feature files (Optional)
decode_batch_size={r.get('decode_batch_size', 32)} # batch size in decoding

#######################################
#            OTHER SETTING            #
#######################################""")
    lines.append(r["db_root_line"])
    if "download_url" in r:
        lines.append(f'download_url="{r["download_url"]}" # google drive URL of the mini corpus')
    lines.append('tag=""                   # tag for network directory naming (Optional)')

    lines.append("""
# parse options
. parse_options.sh || exit 1;
""")
    if r.get("fixed_ft_check"):
        other = "melspc" if ft == "world" else "world"
        lines.append(f"""# check feature type
if [ ${{feature_type}} != "{ft}" ]; then
    echo "This recipe only supports feature_type={ft} (not {other})." 1>&2
    exit 1;
fi
""")
    lines.append(r["set_names"])
    lines.append("""
# stop when error occurred
set -euo pipefail
# }}}
""")

    # ---------------- stage 0 ----------------
    lines.append("""
# STAGE 0 {{{
if echo ${stage} | grep -q 0; then
    echo "###########################################################"
    echo "#                 DATA PREPARATION STEP                   #"
    echo "###########################################################" """)
    lines.append(r["stage0"])
    lines.append("""fi
# }}}
""")

    # ---------------- stage 1 ----------------
    if ft == "world":
        if r.get("f0_from_conf"):
            f0_resolve = ('    [ ! -n "${minf0}" ] && minf0=$(awk \'{print $1}\' conf/${spk}.f0)\n'
                          '    [ ! -n "${maxf0}" ] && maxf0=$(awk \'{print $2}\' conf/${spk}.f0)\n')
            if "spks" in r or "train_spks" in r:
                f0_resolve = ""  # per-speaker resolution happens in the loop
        else:
            f0_resolve = ""
        feat_flags = """                --feature_type ${feature_type} \\
                --fs ${fs} \\
                --shiftms ${shiftms} \\
                --minf0 "${minf0}" \\
                --maxf0 "${maxf0}" \\
                --mcep_dim ${mcep_dim} \\
                --mcep_alpha ${mcep_alpha} \\
                --highpass_cutoff ${highpass_cutoff} \\
                --fftl ${fftl} \\
                --n_jobs ${n_jobs}"""
    else:
        f0_resolve = ""
        feat_flags = """                --feature_type ${feature_type} \\
                --fs ${fs} \\
                --shiftms ${shiftms} \\
                --mspc_dim ${mspc_dim} \\
                --highpass_cutoff ${highpass_cutoff} \\
                --fftl ${fftl} \\
                --fmin "${fmin}" \\
                --fmax "${fmax}" \\
                --n_jobs ${n_jobs}"""

    multi_spk = ("spks" in r or "train_spks" in r) and ft == "world"
    mcep_extra = ""
    if ft == "melspc":
        mcep_extra = """
        # extract stft-based mel-cepstrum for noise shaping
        if [ ${set} = ${train} ] && ${use_noise_shaping}; then
            ${train_cmd} --num-threads ${n_jobs} exp/feature_extract/feature_extract_mcep_${set}.log \\
                feature_extract.py \\
                    --waveforms data/${set}/wav.scp \\
                    --wavdir wav_hpf/${set} \\
                    --hdf5dir hdf5/${set} \\
                    --feature_type mcep \\
                    --fs ${fs} \\
                    --shiftms ${shiftms} \\
                    --mcep_dim ${mcep_dim} \\
                    --mcep_alpha ${mcep_alpha} \\
                    --highpass_cutoff ${highpass_cutoff} \\
                    --save_wav false \\
                    --fftl ${fftl} \\
                    --n_jobs ${n_jobs}
        fi
"""
    if multi_spk:
        if "train_spks" in r:
            spk_select = ("""        if [ ${set} = ${train} ]; then
            spk_list=("${train_spks[@]}")
        else
            spk_list=("${eval_spks[@]}")
        fi""")
        else:
            spk_select = '        spk_list=("${spks[@]}")'
        lines.append(f"""
# STAGE 1 {{{{{{
if echo ${{stage}} | grep -q 1; then
    echo "###########################################################"
    echo "#               FEATURE EXTRACTION STEP                   #"
    echo "###########################################################"
    for set in ${{train}} ${{eval}};do
{spk_select}
        for spk in "${{spk_list[@]}}";do
            mkdir -p exp/feature_extract/${{set}}
            # per-speaker wav list and f0 range (conf/<spk>.f0)
            scp=exp/feature_extract/${{set}}/wav.${{spk}}.scp
            grep ${{spk}} data/${{set}}/wav.scp > ${{scp}}
            minf0=$(awk '{{print $1}}' conf/${{spk}}.f0)
            maxf0=$(awk '{{print $2}}' conf/${{spk}}.f0)
            ${{train_cmd}} --num-threads ${{n_jobs}} exp/feature_extract/feature_extract_${{set}}.${{spk}}.log \\
                feature_extract.py \\
                    --waveforms ${{scp}} \\
                    --wavdir wav_hpf/${{set}}/${{spk}} \\
                    --hdf5dir hdf5/${{set}}/${{spk}} \\
    {feat_flags}
        done

        # check the number of feature files
        n_wavs=$(wc -l < data/${{set}}/wav.scp)
        n_feats=$(find hdf5/${{set}} -name "*.h5" | wc -l)
        echo "${{n_feats}}/${{n_wavs}} files are successfully processed."

        # make scp files
        if [ ${{highpass_cutoff}} -eq 0 ];then
            cp data/${{set}}/wav.scp data/${{set}}/wav_hpf.scp
        else
            find wav_hpf/${{set}} -name "*.wav" | sort > data/${{set}}/wav_hpf.scp
        fi
        find hdf5/${{set}} -name "*.h5" | sort > data/${{set}}/feats.scp
    done
fi
# }}}}}}
""")
    else:
        lines.append(f"""
# STAGE 1 {{{{{{
if echo ${{stage}} | grep -q 1; then
    echo "###########################################################"
    echo "#               FEATURE EXTRACTION STEP                   #"
    echo "###########################################################"
{f0_resolve}    for set in ${{train}} ${{eval}};do
        ${{train_cmd}} --num-threads ${{n_jobs}} exp/feature_extract/feature_extract_${{set}}.log \\
            feature_extract.py \\
                --waveforms data/${{set}}/wav.scp \\
                --wavdir wav_hpf/${{set}} \\
                --hdf5dir hdf5/${{set}} \\
{feat_flags}
{mcep_extra}
        # check the number of feature files
        n_wavs=$(wc -l < data/${{set}}/wav.scp)
        n_feats=$(find hdf5/${{set}} -name "*.h5" | wc -l)
        echo "${{n_feats}}/${{n_wavs}} files are successfully processed."

        # make scp files
        if [ ${{highpass_cutoff}} -eq 0 ];then
            cp data/${{set}}/wav.scp data/${{set}}/wav_hpf.scp
        else
            find wav_hpf/${{set}} -name "*.wav" | sort > data/${{set}}/wav_hpf.scp
        fi
        find hdf5/${{set}} -name "*.h5" | sort > data/${{set}}/feats.scp
    done
fi
# }}}}}}
""")

    # ---------------- stage 2 ----------------
    mcep_stats = ""
    if ft == "melspc":
        mcep_stats = """    if ${use_noise_shaping};then
        ${train_cmd} exp/calculate_statistics/calc_stats_mcep_${train}.log \\
            calc_stats.py \\
                --feats data/${train}/feats.scp \\
                --stats data/${train}/stats.h5 \\
                --feature_type mcep
    fi
"""
    lines.append(f"""
# STAGE 2 {{{{{{
if echo ${{stage}} | grep -q 2; then
    echo "###########################################################"
    echo "#              CALCULATE STATISTICS STEP                  #"
    echo "###########################################################"
    ${{train_cmd}} exp/calculate_statistics/calc_stats_${{train}}.log \\
        calc_stats.py \\
            --feats data/${{train}}/feats.scp \\
            --stats data/${{train}}/stats.h5 \\
            --feature_type ${{feature_type}}
{mcep_stats}    echo "statistics are successfully calculated."
fi
# }}}}}}
""")

    # ---------------- stage 3 ----------------
    ns_ft = "world" if ft == "world" else "mcep"
    ns_dims = ("            --mcep_dim_start 2 \\\n"
               "            --mcep_dim_end $(( 2 + mcep_dim + 1 )) \\\n") if ns_ft == "world" else \
              ("            --mcep_dim_start 0 \\\n"
               "            --mcep_dim_end $(( mcep_dim + 1 )) \\\n")
    lines.append(f"""
# STAGE 3 {{{{{{
if echo ${{stage}} | grep -q 3 && ${{use_noise_shaping}}; then
    echo "###########################################################"
    echo "#                  NOISE WEIGHTING STEP                   #"
    echo "###########################################################"
    ${{train_cmd}} --num-threads ${{n_jobs}} exp/noise_shaping/noise_shaping_apply_${{train}}.log \\
        noise_shaping.py \\
            --waveforms data/${{train}}/wav_hpf.scp \\
            --stats data/${{train}}/stats.h5 \\
            --outdir wav_nwf/${{train}} \\
            --feature_type {ns_ft} \\
            --fs ${{fs}} \\
            --shiftms ${{shiftms}} \\
{ns_dims}            --mcep_alpha ${{mcep_alpha}} \\
            --mag ${{mag}} \\
            --inv true \\
            --n_jobs ${{n_jobs}}

    find wav_nwf/${{train}} -name "*.wav" | sort > data/${{train}}/wav_nwf.scp
fi
# }}}}}}
""")

    # ---------------- stage 4 ----------------
    lines.append(f"""
# STAGE 4 {{{{{{
# set variables
if [ ! -n "${{tag}}" ];then
    expdir={r['expdir']}
    if ${{use_noise_shaping}};then
        expdir=${{expdir}}_ns
    fi
    if ${{use_upsampling}};then
        expdir=${{expdir}}_up
    fi
else
    expdir=exp/tr_{r['exp_prefix']}_${{tag}}
fi
if echo ${{stage}} | grep -q 4; then
    echo "###########################################################"
    echo "#               WAVENET TRAINING STEP                     #"
    echo "###########################################################"
    if ${{use_noise_shaping}};then
        waveforms=data/${{train}}/wav_nwf.scp
    else
        waveforms=data/${{train}}/wav_hpf.scp
    fi
    upsampling_factor=$(python3 -c "print(int(${{shiftms}} * ${{fs}} / 1000 + 0.5))")
    [ ! -e ${{expdir}}/log ] && mkdir -p ${{expdir}}/log
    [ ! -e ${{expdir}}/stats.h5 ] && cp -v data/${{train}}/stats.h5 ${{expdir}}
    ${{cuda_cmd}} --gpu ${{n_devices}} "${{expdir}}/log/${{train}}.log" \\
        train.py \\
            --n_devices ${{n_devices}} \\
            --waveforms ${{waveforms}} \\
            --feats data/${{train}}/feats.scp \\
            --stats data/${{train}}/stats.h5 \\
            --expdir "${{expdir}}" \\
            --feature_type ${{feature_type}} \\
            --n_quantize ${{n_quantize}} \\
            --n_aux ${{n_aux}} \\
            --n_resch ${{n_resch}} \\
            --n_skipch ${{n_skipch}} \\
            --dilation_depth ${{dilation_depth}} \\
            --dilation_repeat ${{dilation_repeat}} \\
            --kernel_size ${{kernel_size}} \\
            --lr ${{lr}} \\
            --weight_decay ${{weight_decay}} \\
            --iters ${{iters}} \\
            --batch_length ${{batch_length}} \\
            --batch_size ${{batch_size}} \\
            --checkpoint_interval ${{checkpoint_interval}} \\
            --upsampling_factor "${{upsampling_factor}}" \\
            --use_upsampling_layer ${{use_upsampling}} \\
            --resume "${{resume}}"
fi
# }}}}}}


# STAGE 5 {{{{{{
[ ! -n "${{outdir}}" ] && outdir=${{expdir}}/wav
[ ! -n "${{checkpoint}}" ] && checkpoint=${{expdir}}/checkpoint-final.pkl
[ ! -n "${{config}}" ] && config=$(dirname ${{checkpoint}})/model.conf
[ ! -n "${{stats}}" ] && stats=$(dirname ${{checkpoint}})/stats.h5
[ ! -n "${{feats}}" ] && feats=data/${{eval}}/feats.scp
if echo ${{stage}} | grep -q 5; then
    echo "###########################################################"
    echo "#               WAVENET DECODING STEP                     #"
    echo "###########################################################"
    [ ! -e ${{outdir}}/log ] && mkdir -p ${{outdir}}/log
    ${{cuda_cmd}} --gpu ${{n_devices}} "${{outdir}}/log/decode.log" \\
        decode.py \\
            --n_devices ${{n_devices}} \\
            --feats ${{feats}} \\
            --stats ${{stats}} \\
            --outdir "${{outdir}}" \\
            --checkpoint "${{checkpoint}}" \\
            --config "${{config}}" \\
            --fs ${{fs}} \\
            --batch_size ${{decode_batch_size}}
fi
# }}}}}}


# STAGE 6 {{{{{{
if echo ${{stage}} | grep -q 6 && ${{use_noise_shaping}}; then
    echo "###########################################################"
    echo "#                  NOISE SHAPING STEP                     #"
    echo "###########################################################"
    find "${{outdir}}" -name "*.wav" | sort > ${{outdir}}/wav.scp
    ${{train_cmd}} --num-threads ${{n_jobs}} exp/noise_shaping/noise_shaping_restore_${{eval}}.log \\
        noise_shaping.py \\
            --waveforms ${{outdir}}/wav.scp \\
            --stats ${{stats}} \\
            --outdir "${{outdir}}"_nsf \\
            --feature_type {ns_ft} \\
            --fs ${{fs}} \\
            --shiftms ${{shiftms}} \\
{ns_dims}            --mcep_alpha ${{mcep_alpha}} \\
            --mag ${{mag}} \\
            --n_jobs ${{n_jobs}} \\
            --inv false
fi
# }}}}}}
""")
    return "\n".join(lines)


ARCTIC_DOWNLOAD = """    if [ ! -e ${ARCTIC_DB_ROOT}/.done ];then
        mkdir -p ${ARCTIC_DB_ROOT}
        cd ${ARCTIC_DB_ROOT}
        for id in bdl slt rms clb jmk ksp awb;do
            wget http://festvox.org/cmu_arctic/cmu_arctic/packed/cmu_us_${id}_arctic-0.95-release.tar.bz2
            tar xf cmu_us_${id}*.tar.bz2
        done
        rm ./*.tar.bz2
        cd ../
        touch ${ARCTIC_DB_ROOT}/.done
        echo "database is successfully downloaded."
    fi"""

STAGE0_ARCTIC_SD = ARCTIC_DOWNLOAD + """
    mkdir -p data/local "data/${train}" "data/${eval}"
    find "${ARCTIC_DB_ROOT}/cmu_us_${spk}_arctic/wav" -name "*.wav" \\
        | sort > "data/local/wav.${spk}.scp"
    head -n 1028 "data/local/wav.${spk}.scp" > "data/${train}/wav.scp"
    tail -n 104 "data/local/wav.${spk}.scp" > "data/${eval}/wav.scp"
    echo "#training = $(wc -l < data/${train}/wav.scp), #evaluation = $(wc -l < data/${eval}/wav.scp)"
"""

STAGE0_ARCTIC_SICLOSE = ARCTIC_DOWNLOAD + """
    mkdir -p data/local "data/${train}" "data/${eval}"
    rm -f "data/${train}/wav.scp" "data/${eval}/wav.scp"
    for spk in "${spks[@]}";do
        find "${ARCTIC_DB_ROOT}/cmu_us_${spk}_arctic/wav" -name "*.wav" \\
            | sort > "data/local/wav.${spk}.scp"
        head -n 1028 "data/local/wav.${spk}.scp" >> "data/${train}/wav.scp"
        tail -n 104 "data/local/wav.${spk}.scp" >> "data/${eval}/wav.scp"
    done
    echo "#training = $(wc -l < data/${train}/wav.scp), #evaluation = $(wc -l < data/${eval}/wav.scp)"
"""

STAGE0_ARCTIC_SIOPEN = ARCTIC_DOWNLOAD + """
    mkdir -p data/local "data/${train}" "data/${eval}"
    rm -f "data/${train}/wav.scp" "data/${eval}/wav.scp"
    for spk in "${train_spks[@]}";do
        find "${ARCTIC_DB_ROOT}/cmu_us_${spk}_arctic/wav" -name "*.wav" \\
            | sort > "data/local/wav.${spk}.scp"
        head -n 1028 "data/local/wav.${spk}.scp" >> "data/${train}/wav.scp"
    done
    for spk in "${eval_spks[@]}";do
        find "${ARCTIC_DB_ROOT}/cmu_us_${spk}_arctic/wav" -name "*.wav" \\
            | sort > "data/local/wav.${spk}.scp"
        tail -n 104 "data/local/wav.${spk}.scp" >> "data/${eval}/wav.scp"
    done
    echo "#training = $(wc -l < data/${train}/wav.scp), #evaluation = $(wc -l < data/${eval}/wav.scp)"
"""

STAGE0_ARCTIC_MINI = """    if [ ! -e ${download_dir}/.done ];then
        download_from_google_drive.sh "${download_url}" ${download_dir} tar.gz
        touch ${download_dir}/.done
        echo "database is successfully downloaded."
    fi
    mkdir -p data/local "data/${train}" "data/${eval}"
    find "${download_dir}/cmu_us_${spk}_arctic_mini/wav" -name "*.wav" \\
        | sort > "data/local/wav.${spk}.scp"
    head -n 32 "data/local/wav.${spk}.scp" > "data/${train}/wav.scp"
    tail -n 4 "data/local/wav.${spk}.scp" > "data/${eval}/wav.scp"
    echo "#training = $(wc -l < data/${train}/wav.scp), #evaluation = $(wc -l < data/${eval}/wav.scp)"
"""

STAGE0_LJSPEECH = """    if [ ! -e ${LJSPEECH_DB_ROOT}/.done ];then
        mkdir -p ${LJSPEECH_DB_ROOT}
        cd ${LJSPEECH_DB_ROOT}
        wget http://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2
        tar -xf ./*.tar.bz2
        rm ./*.tar.bz2
        cd ../
        touch ${LJSPEECH_DB_ROOT}/.done
        echo "database is successfully downloaded."
    fi
    mkdir -p data/local "data/${train}" "data/${eval}"
    find ${LJSPEECH_DB_ROOT}/LJSpeech-1.1/wavs -name "*.wav" \\
        | sort > data/local/wav.scp
    grep -v LJ050 data/local/wav.scp > data/${train}/wav.scp
    grep LJ050 data/local/wav.scp > data/${eval}/wav.scp
    echo "#training = $(wc -l < data/${train}/wav.scp), #evaluation = $(wc -l < data/${eval}/wav.scp)"
"""

STAGE0_MAILABS = """    if [ ! -e ${DB_ROOT}/.done ];then
        mkdir -p ${DB_ROOT}
        cd ${DB_ROOT}
        wget http://www.caito.de/data/Training/stt_tts/en_US.tgz
        wget http://www.caito.de/data/Training/stt_tts/en_UK.tgz
        tar xzf en_US.tgz
        tar xzf en_UK.tgz
        rm ./*.tgz
        cd ../
        touch ${DB_ROOT}/.done
        echo "database is successfully downloaded."
    fi
    mkdir -p data/local "data/${train}" "data/${eval}"
    case ${spk} in
        elizabeth) spkdir=en_UK/by_book/female/elizabeth_klett; eval_pat="wives_and_daughters_60_" ;;
        judy)      spkdir=en_US/by_book/female/judy_bieber;     eval_pat="the_sea_faries_22_" ;;
        mary)      spkdir=en_US/by_book/female/mary_ann;        eval_pat="northandsouth_52_" ;;
        elliot)    spkdir=en_US/by_book/male/elliot_miller;     eval_pat="silent_bullet_13_" ;;
        *) echo "unknown speaker ${spk}"; exit 1 ;;
    esac
    find ${DB_ROOT}/${spkdir} -name "*.wav" | sort > data/local/wav.${spk}.scp
    grep -v "${eval_pat}" data/local/wav.${spk}.scp > data/${train}/wav.scp
    grep "${eval_pat}" data/local/wav.${spk}.scp > data/${eval}/wav.scp
    echo "#training = $(wc -l < data/${train}/wav.scp), #evaluation = $(wc -l < data/${eval}/wav.scp)"
"""


def exp_sd(db, fsk, extra_spk=True):
    spk = "_${spk}" if extra_spk else ""
    return (f"exp/tr_{db}_{fsk}_sd_${{feature_type}}{spk}_nq${{n_quantize}}_na${{n_aux}}"
            "_nrc${n_resch}_nsc${n_skipch}_ks${kernel_size}_dp${dilation_depth}"
            "_dr${dilation_repeat}_lr${lr}_wd${weight_decay}_bl${batch_length}_bs${batch_size}")


RECIPES = {
    "arctic/sd": dict(
        title="SCRIPT TO BUILD SD WAVENET VOCODER",
        feature_type="world", spk="slt",
        spk_comment="target speaker in arctic (slt bdl rms clb jmk ksp awb)",
        f0_from_conf=True, fixed_ft_check=True,
        shiftms=5, fs=16000, mcep_dim=24, mcep_alpha=0.410, n_aux=28,
        db_root_line="ARCTIC_DB_ROOT=downloads # directory including DB (downloaded if missing)",
        set_names='# set directory names\ntrain=tr_${spk}\neval=ev_${spk}',
        stage0=STAGE0_ARCTIC_SD,
        expdir=exp_sd("arctic", "16k"), exp_prefix="arctic",
        conf_f0=True,
    ),
    "arctic/sd-mini": dict(
        title="DEMO SCRIPT TO BUILD SD WAVENET VOCODER",
        feature_type="world", spk="slt", f0_from_conf=True,
        shiftms=5, fs=16000, mcep_dim=24, mcep_alpha=0.410, n_aux=28,
        train=dict(n_resch=32, n_skipch=16, dilation_depth=5,
                   dilation_repeat=1, iters=1000, batch_length=10000,
                   checkpoint_interval=100),
        decode_batch_size=4,
        db_root_line="download_dir=downloads # download directory to save corpus",
        download_url="https://drive.google.com/open?id=1NIia89CL2qqqDzNNc718wycRmI_jkLxR",
        set_names='# set directory names\ntrain=tr_${spk}\neval=ev_${spk}',
        stage0=STAGE0_ARCTIC_MINI,
        expdir=exp_sd("arctic_mini", "16k"), exp_prefix="arctic_mini",
        conf_f0=True,
    ),
    "arctic/sd-melspc": dict(
        title="SCRIPT TO BUILD SD WAVENET VOCODER (MELSPC)",
        feature_type="melspc", spk="slt", fixed_ft_check=True,
        shiftms=5, fs=16000, mcep_dim=24, mcep_alpha=0.410, n_aux=80,
        mspc_dim=80,
        db_root_line="ARCTIC_DB_ROOT=downloads # directory including DB (downloaded if missing)",
        set_names='# set directory names\ntrain=tr_${spk}\neval=ev_${spk}',
        stage0=STAGE0_ARCTIC_SD,
        expdir=exp_sd("arctic", "16k"), exp_prefix="arctic",
    ),
    "arctic/si-close": dict(
        title="SCRIPT TO BUILD SI-CLOSE WAVENET VOCODER",
        feature_type="world", spks=["bdl", "rms", "clb", "slt", "ksp", "jmk"],
        f0_from_conf=True, conf_f0=True, fixed_ft_check=True,
        shiftms=5, fs=16000, mcep_dim=24, mcep_alpha=0.410, n_aux=28,
        db_root_line="ARCTIC_DB_ROOT=downloads # directory including DB (downloaded if missing)",
        set_names=('# set directory names\n'
                   'train=tr_"$(IFS=_; echo "${spks[*]}")"\n'
                   'eval=ev_"$(IFS=_; echo "${spks[*]}")"'),
        stage0=STAGE0_ARCTIC_SICLOSE,
        expdir=("exp/tr_arctic_16k_si_close_${feature_type}"
                "_nq${n_quantize}_na${n_aux}_nrc${n_resch}_nsc${n_skipch}"
                "_ks${kernel_size}_dp${dilation_depth}_dr${dilation_repeat}"
                "_lr${lr}_wd${weight_decay}_bl${batch_length}_bs${batch_size}"),
        exp_prefix="arctic",
    ),
    "arctic/si-open": dict(
        title="SCRIPT TO BUILD SI-OPEN WAVENET VOCODER",
        feature_type="world",
        train_spks=["bdl", "rms", "clb", "ksp", "jmk"], eval_spks=["slt"],
        f0_from_conf=True, conf_f0=True, fixed_ft_check=True,
        shiftms=5, fs=16000, mcep_dim=24, mcep_alpha=0.410, n_aux=28,
        db_root_line="ARCTIC_DB_ROOT=downloads # directory including DB (downloaded if missing)",
        set_names=('# set directory names\n'
                   'train=tr_wo_"$(IFS=_; echo "${eval_spks[*]}")"\n'
                   'eval=ev_wo_"$(IFS=_; echo "${eval_spks[*]}")"'),
        stage0=STAGE0_ARCTIC_SIOPEN,
        expdir=("exp/tr_arctic_16k_si_open_${feature_type}"
                '_"$(IFS=_; echo "${eval_spks[*]}")"'
                "_nq${n_quantize}_na${n_aux}_nrc${n_resch}_nsc${n_skipch}"
                "_ks${kernel_size}_dp${dilation_depth}_dr${dilation_repeat}"
                "_lr${lr}_wd${weight_decay}_bl${batch_length}_bs${batch_size}"),
        exp_prefix="arctic",
    ),
    "ljspeech/sd": dict(
        title="SCRIPT TO BUILD SD WAVENET VOCODER (LJSPEECH)",
        feature_type="world", minf0=40, maxf0=400, fixed_ft_check=True,
        shiftms=5, fs=22050, mcep_dim=34, mcep_alpha=0.455, n_aux=39,
        kernel_size=3, train=dict(batch_length=15000),
        decode_batch_size=16,
        db_root_line="LJSPEECH_DB_ROOT=downloads # directory including DB (downloaded if missing)",
        set_names='# set directory names\ntrain=tr_ljspeech\neval=ev_ljspeech',
        stage0=STAGE0_LJSPEECH,
        expdir=exp_sd("ljspeech", "22k", extra_spk=False),
        exp_prefix="ljspeech_22k",
    ),
    "ljspeech/sd-melspc": dict(
        title="SCRIPT TO BUILD SD WAVENET VOCODER (LJSPEECH MELSPC)",
        feature_type="melspc", fixed_ft_check=True,
        shiftms=11.61, fs=22050, mcep_dim=35, mcep_alpha=0.455, n_aux=80,
        mspc_dim=80, kernel_size=3, train=dict(batch_length=15000),
        decode_batch_size=16,
        db_root_line="LJSPEECH_DB_ROOT=downloads # directory including DB (downloaded if missing)",
        set_names='# set directory names\ntrain=tr_ljspeech\neval=ev_ljspeech',
        stage0=STAGE0_LJSPEECH,
        expdir=exp_sd("ljspeech", "22k", extra_spk=False),
        exp_prefix="ljspeech_22k",
    ),
    "m-ailabs-speech/sd": dict(
        title="SCRIPT TO BUILD SD WAVENET VOCODER (M-AILABS)",
        feature_type="world", spk="elizabeth",
        spk_comment="judy (F) or mary (F) or elliot (M) or elizabeth (F)",
        minf0=40, maxf0=400, fixed_ft_check=True,
        shiftms=5, fs=16000, mcep_dim=24, mcep_alpha=0.410, n_aux=28,
        db_root_line="DB_ROOT=downloads # directory including DB (downloaded if missing)",
        set_names='# set directory names\ntrain=tr_${spk}\neval=ev_${spk}',
        stage0=STAGE0_MAILABS,
        expdir=exp_sd("mai", "16k"), exp_prefix="mai_16k",
    ),
    "m-ailabs-speech/sd-melspc": dict(
        title="SCRIPT TO BUILD SD WAVENET VOCODER (M-AILABS MELSPC)",
        feature_type="melspc", spk="elizabeth",
        spk_comment="judy (F) or mary (F) or elliot (M) or elizabeth (F)",
        fixed_ft_check=True,
        shiftms=16, fs=16000, mcep_dim=25, mcep_alpha=0.410, n_aux=80,
        mspc_dim=80,
        db_root_line="DB_ROOT=downloads # directory including DB (downloaded if missing)",
        set_names='# set directory names\ntrain=tr_${spk}\neval=ev_${spk}',
        stage0=STAGE0_MAILABS,
        expdir=exp_sd("mai", "16k"), exp_prefix="mai_16k",
    ),
}

# si melspc variants share the si world recipes' data prep with melspc features
RECIPES["arctic/si-close-melspc"] = dict(
    RECIPES["arctic/si-close"],
    title="SCRIPT TO BUILD SI-CLOSE WAVENET VOCODER (MELSPC)",
    feature_type="melspc", n_aux=80, mspc_dim=80,
)
RECIPES["arctic/si-close-melspc"].pop("minf0", None)
RECIPES["arctic/si-close-melspc"].pop("maxf0", None)
RECIPES["arctic/si-open-melspc"] = dict(
    RECIPES["arctic/si-open"],
    title="SCRIPT TO BUILD SI-OPEN WAVENET VOCODER (MELSPC)",
    feature_type="melspc", n_aux=80, mspc_dim=80,
)
RECIPES["arctic/si-open-melspc"].pop("minf0", None)
RECIPES["arctic/si-open-melspc"].pop("maxf0", None)


def main() -> None:
    for name, r in RECIPES.items():
        d = os.path.join(EGS, name)
        conf = os.path.join(d, "conf")
        os.makedirs(conf, exist_ok=True)
        run_path = os.path.join(d, "run.sh")
        with open(run_path, "w") as f:
            f.write(gen_run_sh(r))
        os.chmod(run_path, os.stat(run_path).st_mode | stat.S_IEXEC
                 | stat.S_IXGRP | stat.S_IXOTH)
        with open(os.path.join(d, "path.sh"), "w") as f:
            f.write(PATH_SH)
        with open(os.path.join(d, "cmd.sh"), "w") as f:
            f.write(CMD_SH)
        with open(os.path.join(conf, "slurm.conf"), "w") as f:
            f.write(SLURM_CONF)
        if r.get("conf_f0"):
            for spk, v in F0_CONF.items():
                with open(os.path.join(conf, f"{spk}.f0"), "w") as f:
                    f.write(v + "\n")
        print("generated", name)


if __name__ == "__main__":
    main()
