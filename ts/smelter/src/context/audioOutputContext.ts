/**
 * Per-output audio mixer state: every mounted component contributes a
 * volume for its input; contributions sum (clamped to 1.0) into the
 * output's audio scene.
 */
import type { InputRef } from '../types/refs/inputRef.js';
import { areRefsEqual } from '../types/refs/utils.js';

export type ContextAudioOptions = {
  volume: number;
};

export type AudioInputConfig = {
  inputRef: InputRef;
  volumeComponents: ContextAudioOptions[];
};

export type AudioConfig = Array<{ inputRef: InputRef; volume: number }>;

export class AudioContext {
  private inputs: AudioInputConfig[] = [];
  private onChange: () => void;

  constructor(onChange: () => void) {
    this.onChange = onChange;
  }

  public getAudioConfig(): AudioConfig {
    return this.inputs.map(input => ({
      inputRef: input.inputRef,
      volume: Math.min(
        input.volumeComponents.reduce((acc, c) => acc + c.volume, 0),
        1.0
      ),
    }));
  }

  public addInputAudioComponent(inputRef: InputRef, options: ContextAudioOptions): void {
    const existing = this.inputs.find(input => areRefsEqual(input.inputRef, inputRef));
    if (existing) {
      existing.volumeComponents = [...existing.volumeComponents, options];
    } else {
      this.inputs = [...this.inputs, { inputRef, volumeComponents: [options] }];
    }
    this.onChange();
  }

  public removeInputAudioComponent(inputRef: InputRef, options: ContextAudioOptions): void {
    const existing = this.inputs.find(input => areRefsEqual(input.inputRef, inputRef));
    if (!existing) {
      return;
    }
    existing.volumeComponents = existing.volumeComponents.filter(c => c !== options);
    if (existing.volumeComponents.length === 0) {
      this.inputs = this.inputs.filter(input => !areRefsEqual(input.inputRef, inputRef));
    }
    this.onChange();
  }
}
